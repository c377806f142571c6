"""Composed training-data cleaning pipeline over a documents table.

The end-to-end use case the extension operators exist for (SURVEY
north star): exact dedup -> near-dup keep-one -> quality gate ->
language gate, all as one declarative DataFrame chain so Catalyst
plans the whole thing (shared scans, pushed filters) — not a
collect-and-reload between stages.

Scale shape: two narrow shuffles for dedup (content hash; MinHash
band buckets), one for the near-dup components, then broadcast-size
joins of the per-doc score frames back onto the kept set.  Everything
else is per-row JVM codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from . import dedup, textstats


def clean_corpus(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", neardup_threshold: float = 0.5,
                 min_quality: float = 0.75,
                 languages: tuple[str, ...] = ("en",)) -> DataFrame:
    """Survivor set of the standard cleaning pipeline:

    1. exact dedup (md5 content hash, min id wins);
    2. near-dup dedup on the survivors (MinHash-LSH pairs -> connected
       components -> min-id keeper per cluster);
    3. quality gate: heuristic score >= ``min_quality``
       (textstats.quality_score);
    4. language gate: stopword-hit language id in ``languages``.

    Returns (id_col, quality, predicted_lang) for the surviving
    documents — deterministic, so the DuckDB oracle replays it
    exactly.
    """
    kept_exact = dedup.deduplicate_exact(docs, text_col, id_col)
    kept = dedup.deduplicate_neardup(kept_exact, neardup_threshold,
                                     text_col, id_col)
    quality = textstats.quality_score(kept).select(id_col, "quality")
    lang = textstats.language_id(kept).select(id_col, "predicted_lang")
    return (kept.select(id_col)
            .join(quality, id_col)
            .join(lang, id_col)
            .filter((F.col("quality") >= min_quality) &
                    F.col("predicted_lang").isin(list(languages)))
            .select(id_col, "quality", "predicted_lang"))
