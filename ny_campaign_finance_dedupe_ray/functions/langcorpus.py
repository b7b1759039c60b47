"""Seeded synthetic multilingual corpus for training/evaluating the
language-ID model (tools/train_langid.py, stages/textstats.LangId).

Eight languages, each a list of high-frequency function/content words
(public linguistic knowledge — the sort of list any frequency dictionary
gives).  Sentences are sampled with a Zipf-ish rank distribution so the
n-gram statistics resemble running text rather than a uniform bag.  No
external data: everything derives from these embedded lists and the seed.
"""

from __future__ import annotations

import numpy as np

VOCAB: dict[str, list[str]] = {
    "en": (
        "the and of to in is you that it he was for on are as with his they "
        "at be this have from or one had by word but not what all were we "
        "when your can said there use each which she do how their if will "
        "up other about out many then them these so some her would make "
        "like him into time has look two more write go see number way "
        "could people than first water been call who its now find long down "
        "day did get come made may part over new sound take only little "
        "work know place year live me back give most very after thing our "
        "just name good sentence man think say great where help through"
    ).split(),
    "de": (
        "der die und in den von zu das mit sich des auf für ist im dem "
        "nicht ein eine als auch es an werden aus er hat dass sie nach "
        "wird bei einer um am sind noch wie einem über einen so zum war "
        "haben nur oder aber vor zur bis mehr durch man sein wurde sei "
        "wenn welche können ihre dann unter wir soll ich eines jahr zwei "
        "diese wieder uhr will zwischen immer millionen was sagte gibt "
        "alle seit muss wurden heute woche damit gegen könnte schon"
    ).split(),
    "fr": (
        "de la le et les des en un du une que est pour qui dans par plus "
        "pas au sur ne se ce il sont avec son aux cette ses comme être "
        "fait était ont tout nous sa mais ou si leur dont deux aussi bien "
        "où sans peut cela même ces après très entre autres encore fois "
        "toujours français années premier pendant monde pays vers chaque "
        "moins leurs ainsi déjà faire leurs contre notamment depuis"
    ).split(),
    "es": (
        "de la que el en y a los del se las por un para con no una su al "
        "lo como más pero sus le ya o este sí porque esta entre cuando "
        "muy sin sobre también me hasta hay donde quien desde todo nos "
        "durante todos uno les ni contra otros ese eso ante ellos años "
        "está después vida había tiempo puede mismo ahora cada bien aquí "
        "según gobierno país mundo mientras además ciudad forma parte"
    ).split(),
    "it": (
        "di che e il la in un una per è con non sono da su del le si come "
        "lo più ma anche questo della se hanno essere molto nella quando "
        "loro così fatto dopo alla due stato solo tempo aveva anni quella "
        "quindi senza ancora perché già ogni tutto questa parte prima "
        "vita essere giorno casa governo paese mondo fra tra dove grande "
        "nuovo altri poi sempre oggi modo anno contro quale stati"
    ).split(),
    "pt": (
        "de a o que e do da em um para é com não uma os no se na por mais "
        "as dos como mas foi ao ele das tem à seu sua ou ser quando muito "
        "há nos já está eu também só pelo pela até isso ela entre era "
        "depois sem mesmo aos ter seus quem nas me esse eles estão você "
        "tinha foram essa num anos governo país cidade tempo dia casa "
        "ainda onde sobre todas pode hoje grande segundo contra"
    ).split(),
    "nl": (
        "de van het een en in is dat op te zijn voor met die niet aan er "
        "om ook als dan maar bij of uit naar door over ze zich nog worden "
        "wordt heeft wat meer deze kan hij was geen al tot jaar hebben "
        "onder tegen omdat tussen veel waren wel andere twee mensen werd "
        "dit zo nu hun na moet land volgens alleen weer tijd gaan komen "
        "eerste grote drie echter tijdens toen altijd terwijl"
    ).split(),
    # Chinese: common single characters and a few frequent bigram words.
    # Sentences join WITHOUT spaces (running CJK text); byte trigrams over
    # UTF-8 are highly distinctive (3-byte codepoints).
    "zh": (
        "的 是 在 了 有 和 人 这 中 大 为 上 个 国 我 以 要 他 时 来 用 们 "
        "生 到 作 地 于 出 就 分 对 成 会 可 主 发 年 动 同 工 也 能 下 过 "
        "子 说 产 种 面 而 方 后 多 定 行 学 法 所 民 得 经 十 三 之 进 着 "
        "等 部 度 家 电 力 里 如 水 化 高 自 二 理 起 小 物 现 实 加 量 都 "
        "两 体 制 机 当 使 点 从 业 本 去 把 性 好 应 开 它 数据 公司 时间 "
        "工作 问题 世界 中国 可以 我们 没有 国家 政府 城市"
    ).split(),
}

LANGS = sorted(VOCAB)


def sample_sentences(
    lang: str, n: int, rng: np.random.Generator,
    min_words: int = 4, max_words: int = 28,
) -> list[str]:
    """n sentences in `lang`, Zipf-rank word sampling, seeded by `rng`."""
    vocab = VOCAB[lang]
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    p = (1.0 / ranks) ** 0.9
    p /= p.sum()
    sep = "" if lang == "zh" else " "
    out = []
    for _ in range(n):
        k = int(rng.integers(min_words, max_words + 1))
        words = rng.choice(len(vocab), size=k, p=p)
        out.append(sep.join(vocab[w] for w in words))
    return out


def make_corpus(
    n_per_lang: int, seed: int
) -> tuple[list[str], np.ndarray]:
    """(texts, label_indices into LANGS) — deterministic given the seed."""
    rng = np.random.default_rng(seed)
    texts: list[str] = []
    labels: list[int] = []
    for li, lang in enumerate(LANGS):
        texts.extend(sample_sentences(lang, n_per_lang, rng))
        labels.extend([li] * n_per_lang)
    return texts, np.asarray(labels, dtype=np.int64)
