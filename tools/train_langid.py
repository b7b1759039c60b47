"""Offline trainer for the language-ID artifact.

Regenerates ny_campaign_finance_dedupe_ray/state/artifacts/langid.npz
deterministically from the embedded word lists — run after changing
functions/langcorpus.py or the model config in functions/langid_model.py:

    python tools/train_langid.py

Prints train/held-out accuracy; the held-out gate (>= 0.95 over all
languages) is enforced by tests/test_langid.py.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ny_campaign_finance_dedupe_ray.functions import langcorpus, langid_model as M

TRAIN_SEED = 20260817
N_TRAIN = 800


def main() -> None:
    texts, labels = langcorpus.make_corpus(N_TRAIN, seed=TRAIN_SEED)
    W, b, bloom = M.train(texts, labels, n_classes=len(langcorpus.LANGS))
    gold = np.array(langcorpus.LANGS, dtype=object)
    train_acc = float(
        (M.predict(W, b, langcorpus.LANGS, texts, bloom) == gold[labels]).mean()
    )
    # held out: different seed, same generator
    ho_texts, ho_labels = langcorpus.make_corpus(200, seed=TRAIN_SEED + 1)
    ho_pred = M.predict(W, b, langcorpus.LANGS, ho_texts, bloom)
    ho_acc = float((ho_pred == gold[ho_labels]).mean())
    os.makedirs(os.path.dirname(M.ARTIFACT_PATH), exist_ok=True)
    np.savez_compressed(
        M.ARTIFACT_PATH,
        W=W, b=b, langs=np.array(langcorpus.LANGS, dtype="U8"),
        bloom=np.packbits(bloom),
        k=M.K, d=M.D, slice_chars=M.SLICE_CHARS,
    )
    size = os.path.getsize(M.ARTIFACT_PATH)
    print(
        f"langs={langcorpus.LANGS} train_acc={train_acc:.4f} "
        f"heldout_acc={ho_acc:.4f} artifact={M.ARTIFACT_PATH} ({size/1024:.0f} KiB)"
    )


if __name__ == "__main__":
    main()
