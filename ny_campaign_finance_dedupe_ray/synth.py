"""Deterministic synthetic pages / labels / entities generators (FIXTURES.md).

Rows are generated from latent entities; each entity yields 1..max_copies page
rows whose text carries perturbed copies of the entity fields (character
swap/drop typos, street-abbreviation variants mirroring
/root/reference/data_load/clean_donors.py:53-91, case/punctuation noise per
/root/reference/dedupe_extension/dedupe/dedupe/predicates.py:27-28,80).

Everything is a pure function of (seed, sizes) — ``numpy.random.default_rng``
only, no wall clock, no Python ``hash``.  ``extract_html`` in
stages/extract.py inverts ``render_html`` byte-identically (the per-row
invariant from BASELINE.json ``input_hint``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_FIRST = [
    "mary", "james", "patricia", "john", "jennifer", "robert", "linda",
    "michael", "elizabeth", "william", "barbara", "david", "susan", "richard",
    "jessica", "joseph", "sarah", "thomas", "karen", "charles", "lisa",
    "christopher", "nancy", "daniel", "betty", "matthew", "margaret",
    "anthony", "sandra", "mark",
]
_LAST = [
    "smith", "johnson", "williams", "brown", "jones", "garcia", "miller",
    "davis", "rodriguez", "martinez", "hernandez", "lopez", "gonzalez",
    "wilson", "anderson", "thomas", "taylor", "moore", "jackson", "martin",
    "lee", "perez", "thompson", "white", "harris", "sanchez", "clark",
    "ramirez", "lewis", "robinson",
]
_STREETS = [
    "main street", "oak avenue", "park place", "maple drive", "cedar lane",
    "elm street", "washington avenue", "lake road", "hill street",
    "river road", "church street", "broadway", "madison avenue",
    "lexington avenue", "amsterdam avenue", "columbus circle",
]
_CITIES = [
    "albany", "buffalo", "rochester", "yonkers", "syracuse", "new york",
    "utica", "schenectady", "troy", "binghamton", "ithaca", "poughkeepsie",
]
# Street-abbreviation variant map (subset of clean_donors.py:53-74 groups).
_ABBREV = {
    "street": "st", "avenue": "ave", "drive": "dr", "lane": "ln",
    "road": "rd", "place": "pl", "circle": "cir",
}
_FILLER = [
    "contact us for more information about local events and services.",
    "this profile was last updated by the registry maintainers.",
    "records are provided for public transparency and research.",
    "see the archive page for historical filings and documents.",
    "community listings are refreshed on a rolling basis.",
]
_HOSTS = [
    "records.example.com", "registry.example.org", "donors.example.net",
    "profiles.example.com", "archive.example.org", "listings.example.net",
    "data.example.com", "public.example.org",
]


def render_html(title: str, text: str) -> bytes:
    """Template an HTML page around ``text``; inverted byte-identically by
    stages.extract.extract_html (FIXTURES.md §1)."""
    return (
        "<html><head><title>%s</title></head><body><p>%s</p></body></html>"
        % (title, text)
    ).encode("utf-8")


def _typo(rng: np.random.Generator, word: str) -> str:
    """One character swap/drop/duplicate — recoverable perturbation."""
    if len(word) < 4:
        return word
    kind = rng.integers(0, 3)
    i = int(rng.integers(1, len(word) - 1))
    if kind == 0:  # transpose
        return word[:i] + word[i + 1] + word[i] + word[i + 2:]
    if kind == 1:  # drop
        return word[:i] + word[i + 1:]
    return word[:i] + word[i] + word[i:]  # duplicate


def _perturb_fields(rng, name, street, city):
    """Apply 0–2 noise operations to a copy of the entity fields."""
    n_ops = int(rng.integers(0, 3))
    for _ in range(n_ops):
        op = int(rng.integers(0, 4))
        if op == 0:  # typo in a name token
            toks = name.split()
            j = int(rng.integers(0, len(toks)))
            toks[j] = _typo(rng, toks[j])
            name = " ".join(toks)
        elif op == 1:  # street abbreviation variant
            for full, ab in _ABBREV.items():
                if street.endswith(" " + full):
                    street = street[: -len(full)] + ab
                    break
        elif op == 2:  # punctuation noise (stripped by the normalizer)
            name = name.replace(" ", ", ", 1) if "," not in name else name
        else:  # case noise
            name = name.title()
    return name, street, city


def generate(
    n_entities: int = 300,
    seed: int = 42,
    max_copies: int = 4,
) -> dict[str, pa.Table]:
    """Return {'pages', 'labels', 'entities'} deterministic Arrow tables.

    Hosts are drawn Zipf-ish (rank-weighted) so host-blocking keys are
    skewed, exercising the hot-key caps.
    """
    rng = np.random.default_rng(seed)
    host_w = 1.0 / np.arange(1, len(_HOSTS) + 1)
    host_w /= host_w.sum()

    urls, htmls, texts, langs, ts, ent_of = [], [], [], [], [], []
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    for e in range(n_entities):
        first = _FIRST[int(rng.integers(0, len(_FIRST)))]
        last = _LAST[int(rng.integers(0, len(_LAST)))]
        name = f"{first} {last}"
        num = int(rng.integers(1, 999))
        street = f"{num} {_STREETS[int(rng.integers(0, len(_STREETS)))]}"
        city = _CITIES[int(rng.integers(0, len(_CITIES)))]
        state = "ny"
        zipc = "1%04d" % int(rng.integers(0, 5000))
        n_copies = int(rng.integers(1, max_copies + 1))
        for c in range(n_copies):
            if c == 0:
                nm, st_, ct = name, street, city
            else:
                nm, st_, ct = _perturb_fields(rng, name, street, city)
            filler = _FILLER[int(rng.integers(0, len(_FILLER)))]
            text = f"{nm} | {st_} | {ct} | {state} | {zipc} | {filler}"
            host = _HOSTS[int(rng.choice(len(_HOSTS), p=host_w))]
            url = f"https://{host}/e{e:06d}/p{c}"
            lang = "en" if rng.random() > 0.05 else ("de", "fr")[int(rng.integers(0, 2))]
            urls.append(url)
            htmls.append(render_html(nm, text))
            texts.append(text)
            langs.append(lang)
            ts.append(t0 + np.timedelta64(len(urls) * 1000, "us"))
            ent_of.append(e)

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    entities = pa.table(
        {"url": pa.array(urls, pa.string()), "entity_id": pa.array(ent_of, pa.int64())}
    )

    # Labels: all positive pairs within an entity + seeded negatives
    # (reference convenience.py:206-226 analogue).
    ent = np.asarray(ent_of)
    order = np.argsort(np.asarray(urls))
    ua, ub, ism = [], [], []
    by_ent: dict[int, list[str]] = {}
    for u, e in zip(urls, ent_of):
        by_ent.setdefault(e, []).append(u)
    for e, members in by_ent.items():
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                ua.append(members[i]); ub.append(members[j]); ism.append(True)
    # random negatives, 2x positives
    n_neg = 2 * len(ua)
    us = np.asarray(urls)
    for _ in range(n_neg):
        i, j = rng.integers(0, len(us), size=2)
        if ent[i] == ent[j]:
            continue
        a, b = sorted((str(us[i]), str(us[j])))
        ua.append(a); ub.append(b); ism.append(False)
    labels = pa.table(
        {
            "url_a": pa.array(ua, pa.string()),
            "url_b": pa.array(ub, pa.string()),
            "is_match": pa.array(ism, pa.bool_()),
        }
    )
    return {"pages": pages, "labels": labels, "entities": entities}


def pages_from_documents(
    sf_dir: str, copies_seed: int = 42, copies: int = 1
) -> pa.Table:
    """Deterministically wrap the driver-generated ``documents`` table
    (TESTDATA.md) into the pages shape: url keyed by doc_id, html templated
    via render_html so extract(html) == text byte-identically.

    ``copies > 1`` additionally emits perturbed near-duplicate copies of
    each document (seeded word drops) so the matcher has real work — used
    by bench.py to scale the flagship input from the same testdata."""
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    rng = np.random.default_rng(copies_seed)
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    urls, htmls, out_texts, out_langs, ts = [], [], [], [], []
    for d, x, lg in zip(doc_ids, texts, langs):
        x = x or ""
        for c in range(copies):
            if c == 0:
                tx = x
            else:
                words = x.split()
                if len(words) > 4:
                    drop = int(rng.integers(0, len(words)))
                    tx = " ".join(words[:drop] + words[drop + 1:])
                else:
                    tx = x
            host = _HOSTS[int(rng.integers(0, len(_HOSTS)))]
            urls.append(f"https://{host}/d{d:09d}/c{c}")
            htmls.append(render_html(f"doc {d}", tx))
            out_texts.append(tx)
            out_langs.append(lg)
            ts.append(t0 + np.timedelta64(len(urls) * 1000, "us"))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(out_langs, pa.string()),
        }
    )


def write_fixture(out_dir: str, n_entities: int = 300, seed: int = 42) -> None:
    """Write pages/labels/entities parquet under out_dir."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    tables = generate(n_entities=n_entities, seed=seed)
    for name, tbl in tables.items():
        pq.write_table(tbl, f"{out_dir}/{name}.parquet")
