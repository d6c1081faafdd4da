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
    chained Python nodes run in one stage but pay a full Arrow round-trip
    of the nested spans payload between them (worker -> JVM -> worker) —
    measured 34% of the sf0.1 query wall time. The kernel is mapInArrow
    end-to-end (r6): building the output RecordBatch directly from the
    finalize arrays skips pandas frame construction + per-column
    to_numeric coercion — measured 2x on the output half of the kernel."""
    from .corpus import stream_fn
    from .extract import extract_doc_parts, parts_to_arrow

    p = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    kcfg = cfg or ExtractConfig()
    sgen = stream_fn(mode)
    src = (spark.read.parquet(f"{sf_dir}/documents.parquet")
           .select("doc_id", "text")
           .repartition(p, F.xxhash64("doc_id")))

    def kernel(batches):
        for b in batches:
            names = b.schema.names
            doc_ids = [str(d) for d in
                       b.column(names.index("doc_id")).to_pylist()]
            texts = b.column(names.index("text")).to_pylist()
            parts_list = [extract_doc_parts(did, sgen(did, text), kcfg)
                          for did, text in zip(doc_ids, texts)]
            yield parts_to_arrow(parts_list, doc_ids, None)

    return src.mapInArrow(kernel, SPAN_FLAT_SCHEMA)


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
