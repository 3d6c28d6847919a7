"""htrc_ingester_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch engine with the query/data-processing capabilities of the
reference ingest service (htrc/HTRC-Ingester, studied at /root/reference),
re-expressed Spark-first:

- H3-lite / S2-lite cell indexing (pure-numpy, vectorized Arrow UDFs and —
  where the math allows — plain column expressions that Catalyst codegens).
- Point-in-polygon join: broadcast polygon cell-cover (full/partial cell
  classification) + vectorized ray-casting refine.
- kNN join via iterative anisotropic cell-ring expansion with a provable
  haversine termination bound.
- Deterministic raster tile assignment (pure arithmetic hash — no UDF).
- CDC delta-log parsing, last-writer-wins dedup, tombstone merge
  (reference: cassandra/DeltaLogParser.java, HectorManager.java).
- Validation joins (computed-vs-declared), lineage manifests + resume
  (reference: verify/Verifier.java, the dlog rename state machine).
- Training-data ops: exact/MinHash-LSH/SimHash dedup, ANN similarity,
  text quality/language heuristics, multimodal binary-column plumbing.
"""

__version__ = "0.1.0"
