"""pdf2dom_spark — a PySpark-native document-extraction engine.

A from-scratch reimplementation of the computation performed by
radkovo/Pdf2Dom (reference at /root/reference): tokenize PDF-like content
streams, merge glyph runs into styled text boxes using the reference's
font-metrics / baseline-distance heuristics, classify elements as
text / image / rect / line, and emit an ordered span sequence per document
``(kind, text, media_ref, order)``.

Architecture (Spark-first, not a port):

- The input is a DataFrame of interleaved text+media documents
  ``(doc_id, spans: array<struct<kind,text,media_ref,offset>>)``.
- Extraction runs as one ``mapInPandas`` over Arrow batches; inside the UDF
  everything is columnar pandas/numpy (no per-row Python at the Spark level).
- Skew from giant documents is defused by salted repartitioning on
  ``pmod(xxhash64(doc_id), P)``.
- Per-partition lineage rows enable idempotent checkpoint-resume.

Modules:
  schema     — Spark StructTypes shared by readers, the UDF contract, tests
  fonts      — deterministic synthetic font metrics + FontTable semantics
  tokenizer  — content-stream scanner (regex, C-speed)
  interp     — graphics/text state machine -> glyph + event frames
  textpipe   — vectorized box merging (gaps-and-islands over glyph frames)
  graphics   — path islands, rect recognition, line classification
  extract    — per-document driver: spans in -> ordered span rows out
  corpus     — deterministic synthetic corpora (fixtures + scaled)
  pipeline   — Spark-level wiring: salting, mapInPandas, lineage, resume
  queries    — driver-facing queries() / oracle_sql() registry
  textops    — training-data ops: dedup, lang-id, quality, fingerprints
  simsearch  — embedding similarity search (brute-force + LSH-bucketed)
"""

__version__ = "0.1.0"
