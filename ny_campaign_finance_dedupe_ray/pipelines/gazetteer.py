"""Gazetteer matching: a persistent canonical set matched against streams of
messy records (/root/reference/dedupe_extension/dedupe/dedupe/api.py:630-759:
incremental ``index``/``unindex`` over an indexed_records table; per-query
top-k at clustering.py:280-308).

Ray shape: the canonical side is a (small) indexed Dataset kept by the
Gazetteer object; ``match`` runs record-link blocking (A x B pair
generation) + the scoring actor pool + per-query gazette top-k."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from ..stages.blocking import BlockingConfig, block_records, default_config
from ..stages.clustering import gazette_matching
from ..stages.pairs import candidate_pairs_link
from ..stages.scoring import score_pairs
from ..state.model import Model


class Gazetteer:
    """Holds the canonical records; supports incremental index/unindex and
    streaming match."""

    def __init__(self, cfg: BlockingConfig | None = None, model: Model | None = None):
        self.cfg = cfg or default_config()
        self.model = model
        self._canonical: pd.DataFrame | None = None

    def index(self, canonical: "ray.data.Dataset") -> None:
        """Add canonical records (api.py:630-668)."""
        df = canonical.to_pandas()
        if self._canonical is None:
            self._canonical = df
        else:
            self._canonical = (
                pd.concat([self._canonical, df], ignore_index=True)
                .drop_duplicates("record_id", keep="last")
            )

    def unindex(self, record_ids: list) -> None:
        """Remove canonical records (api.py:669-693)."""
        if self._canonical is not None:
            self._canonical = self._canonical[
                ~self._canonical["record_id"].isin(set(record_ids))
            ]

    def match(
        self,
        messy: "ray.data.Dataset",
        threshold: float = 0.5,
        n_matches: int = 1,
    ) -> "ray.data.Dataset":
        """messy records -> top-``n_matches`` canonical links per messy
        record with score > threshold.  Output: (id_a=messy, id_b=canonical,
        score)."""
        if self._canonical is None or len(self._canonical) == 0:
            raise ValueError("gazetteer has no indexed canonical records")
        canonical = ray.data.from_pandas(self._canonical)
        blocks_a = block_records(messy, self.cfg)
        blocks_b = block_records(canonical, self.cfg)
        pairs = candidate_pairs_link(
            blocks_a, blocks_b, max_block_size=self.cfg.max_block_size
        )
        scores = score_pairs(pairs, model=self.model, min_score=threshold)
        return gazette_matching(scores, threshold=threshold, n_matches=n_matches)
