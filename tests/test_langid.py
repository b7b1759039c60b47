"""Language-ID model gates: held-out accuracy over the seeded synthetic
corpus (VERDICT r2 item 9 done-criterion: >= 95% over >= 5 languages),
artifact/trainer round-trip, and the unknown guards."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ny_campaign_finance_dedupe_ray.functions import langcorpus
from ny_campaign_finance_dedupe_ray.functions import langid_model as M

# seeds distinct from the trainer's (20260817 train / +1 trainer-heldout)
HELDOUT_SEED = 919


def test_heldout_accuracy_all_langs():
    W, b, langs, bloom = M.load_artifact()
    assert len(langs) >= 5
    texts, labels = langcorpus.make_corpus(150, seed=HELDOUT_SEED)
    pred = M.predict(W, b, langs, texts, bloom)
    gold = np.array(langs, dtype=object)[labels]
    overall = float((pred == gold).mean())
    assert overall >= 0.95, f"held-out accuracy {overall:.3f} < 0.95"
    for li, lang in enumerate(langs):
        m = labels == li
        acc = float((pred[m] == gold[m]).mean())
        assert acc >= 0.95, f"{lang}: held-out accuracy {acc:.3f} < 0.95"


def test_unknown_guards():
    W, b, langs, bloom = M.load_artifact()
    pred = M.predict(
        W, b, langs,
        [
            "",                       # below the shingle floor
            "ab",                     # below the shingle floor
            "xq zv kw 9932 @@ qzxv",  # ascii gibberish: bloom coverage
            "Привет как дела сегодня вечером",  # unseen script (Cyrillic)
        ],
        bloom,
    )
    assert pred.tolist() == ["unknown"] * 4


def test_artifact_matches_trainer():
    """The committed npz must equal a fresh deterministic retrain."""
    texts, labels = langcorpus.make_corpus(800, seed=20260817)
    W, b, bloom = M.train(texts, labels, n_classes=len(langcorpus.LANGS))
    W0, b0, langs0, bloom0 = M.load_artifact()
    assert langs0 == langcorpus.LANGS
    np.testing.assert_array_equal(bloom, bloom0)
    np.testing.assert_allclose(W, W0, atol=1e-6)
    np.testing.assert_allclose(b, b0, atol=1e-6)


def test_batch_composition_invariance():
    """Prediction for a row must not depend on its batch neighbors."""
    W, b, langs, bloom = M.load_artifact()
    texts, _ = langcorpus.make_corpus(20, seed=5)
    solo = np.concatenate(
        [M.predict(W, b, langs, [t], bloom) for t in texts]
    )
    together = M.predict(W, b, langs, pa.array(texts, pa.string()), bloom)
    assert solo.tolist() == together.tolist()
