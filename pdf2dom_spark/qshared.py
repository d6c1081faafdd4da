"""Shared scaffolding for the driver-gate query modules.

The query registry is split by domain (qkernel / qunits / qrel /
qsketch — merged and sweep-ordered in queries.py); these helpers are the
pieces more than one domain uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .extract import ExtractConfig
from .schema import SPAN_FLAT_SCHEMA


def _extract_flat(spark: SparkSession, sf_dir: str,
                  cfg: ExtractConfig | None = None,
                  mode: str = "oracle") -> DataFrame:
    """ONE shuffle of the SMALL (doc_id, text) rows on the raw 64-bit hash
    (pmod into p values would leave ~1/e of tasks empty — Poisson
    occupancy), then ONE fused Python kernel that synthesizes the span
    stream and extracts it in the same worker call. Fusing matters: two
    chained mapInPandas nodes run in one stage but pay a full Arrow
    round-trip of the nested spans payload between them (worker -> JVM ->
    worker) — measured 34% of the sf0.1 query wall time."""
    import pandas as pd

    from .corpus import stream_fn
    from .extract import docs_frame_to_spans

    p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    kcfg = cfg or ExtractConfig()
    sgen = stream_fn(mode)
    src = (spark.read.parquet(f"{sf_dir}/documents.parquet")
           .select("doc_id", "text")
           .repartition(p, F.xxhash64("doc_id")))

    def kernel(batches):
        for pdf in batches:
            rows = {"doc_id": [], "spans": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                did = str(doc_id)
                rows["doc_id"].append(did)
                rows["spans"].append(sgen(did, text))
            yield docs_frame_to_spans(pd.DataFrame(rows), kcfg)

    return src.mapInPandas(kernel, SPAN_FLAT_SCHEMA)


def _doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id-only source, salted on the raw 64-bit hash — the shared
    scaffold of the synthesize-inside-the-query kernel gates."""
    p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id").repartition(p, F.xxhash64("doc_id")))




def make_reg(registry: dict, oracles: dict):
    """Domain-module @_reg decorator bound to that module's tables."""
    def _reg(name: str, sql: str | None):
        def deco(fn):
            registry[name] = fn
            if sql is not None:
                oracles[name] = sql
            return fn
        return deco
    return _reg
