"""deduplidog_spark — a from-scratch PySpark-native near-duplicate
detection + clustering engine.

Generalizes the compare-and-flag semantics of CZ-NIC/deduplidog
(reference: /root/reference/deduplidog/deduplidog.py) from a single-node
filesystem walker to DataFrame pipelines over a source-code corpus table
``(repo, path, commit, lang, content)``:

- exact-duplicate grouping by ``sha2(content, 256)``
- name/size/date candidate matching (the reference's default mode)
- near-duplicate candidate generation: MinHash-LSH over character
  shingles, SimHash bit-sampling, winnowing substring fingerprints
- vectorized pair verification (Jaccard / edit distance, Arrow UDFs)
- connected-components clustering with canonical-keeper election
- an action-plan table instead of filesystem mutation

Everything is DataFrame/SQL + Arrow-vectorized pandas UDFs; no RDDs,
no per-row Python in the hot path.
"""

from deduplidog_spark.config import DedupConfig
from deduplidog_spark.session import get_spark

__all__ = ["DedupConfig", "get_spark"]
__version__ = "0.1.0"
