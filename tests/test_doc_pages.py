"""Flagship over document-shaped pages (the bench/entry configuration):
perturbed copies of each document must cluster together."""

from __future__ import annotations

import re

import pandas as pd
import ray.data as rd

from ny_campaign_finance_dedupe_ray import synth
from ny_campaign_finance_dedupe_ray.pipelines.dedupe_pages import dedupe_pages
from ny_campaign_finance_dedupe_ray.stages.blocking import doc_config
from ny_campaign_finance_dedupe_ray.state.model import doc_model


def test_doc_pages_f1():
    pages = synth.pages_from_documents("/root/testdata/sf0.001", copies=3)
    clusters = dedupe_pages(
        rd.from_arrow(pages), cfg=doc_config(), model=doc_model()
    ).to_pandas()
    assert len(clusters) == pages.num_rows
    doc_of = {
        u: re.search(r"/d(\d{9})/", u).group(1) for u in clusters["record_id"]
    }
    cid = dict(zip(clusters["record_id"], clusters["cluster_id"]))
    # (a) recall: perturbed copies of the same document must cluster together
    by_doc: dict[str, list[str]] = {}
    for u, d in doc_of.items():
        by_doc.setdefault(d, []).append(u)
    tp = fn = 0
    for d, urls in by_doc.items():
        urls = sorted(urls)
        for i in range(len(urls)):
            for j in range(i + 1, len(urls)):
                if cid[urls[i]] == cid[urls[j]]:
                    tp += 1
                else:
                    fn += 1
    recall = tp / (tp + fn)
    assert recall >= 0.97, recall

    # (b) precision against the operator's actual contract: a cross-document
    # link is correct iff the two texts really are near-identical, verified
    # by exact shingle jaccard on the ORIGINAL texts (the driver corpus
    # contains genuinely near-duplicate documents under different doc_ids,
    # so doc_id alone is not a valid negative label)
    from ny_campaign_finance_dedupe_ray.functions.hashing import jaccard_shingles

    texts = dict(
        zip(pages.column("url").to_pylist(), pages.column("text").to_pylist())
    )
    cl = pd.DataFrame(
        {
            "url": list(cid.keys()),
            "cluster": list(cid.values()),
            "doc": [doc_of[u] for u in cid],
        }
    )
    bad = total_cross = 0
    for _, sub in cl.groupby("cluster"):
        urls = sorted(sub["url"])
        for i in range(len(urls)):
            for j in range(i + 1, len(urls)):
                if doc_of[urls[i]] != doc_of[urls[j]]:
                    total_cross += 1
                    if jaccard_shingles(texts[urls[i]], texts[urls[j]]) < 0.5:
                        bad += 1
    assert bad == 0, (bad, total_cross)
