"""docopenie_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the capabilities of knowitall/DocOpenIE
(document-level Open Information Extraction), re-expressed Spark-first.

Pipeline (SURVEY.md §3 EP1 Spark equivalent):

    transcripts
      → turn assembly (window-ordered concat + char-offset bookkeeping)
      → sentence segmentation (mapInPandas, offset-preserving)
      → tokenize/POS/chunk/lemma (mapInPandas, Arrow-batched)
      → triple extraction (ReVerb/Ollie-style verbal + Relnoun-style nominal)
      → NER span assembly  ∥  coreference clustering (applyInPandas per conv)
      → best-mention canonicalization (rule engine, per conv)
      → entity linking (broadcast candidate join + scoring + argmax window)
      → coref expansion of links/best-mentions
      → display substitution → final (subj, pred, obj) triples table

Everything is DataFrame-native: built-in pyspark.sql.functions where
expressible, Arrow-batched pandas UDFs (mapInPandas/applyInPandas) where
not. No per-row Python UDFs, no RDDs.
"""

__version__ = "0.1.0"
