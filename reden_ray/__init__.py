"""reden_ray — a Ray-Data-native knowledge-graph construction engine.

Rebuilds the query/data-processing capabilities of the reference
(JianhuanZhuo/REDEN: graph-based named-entity disambiguation against
Linked-Data candidate dictionaries) as streaming ``ray.data.Dataset``
pipelines over Parquet web-page tables.

Nothing in this package calls ``ray.init()`` / ``ray.shutdown()`` —
sessions are owned by the caller (driver, bench.py, or test fixture).
"""

__version__ = "0.1.0"

MENTIONS_PRED = "http://reden-ray.example/ontology#mentions"
CANONICAL_LABEL_PRED = "http://kb.example/onto#canonicalLabel"
SAMEAS_PRED = "http://www.w3.org/2002/07/owl#sameAs"
