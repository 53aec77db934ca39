"""Capability extensions: side-effect sinks (FTP) and multimodal plumbing.

The oracle-certified LLM-pipeline queries (dedup / similarity / text
analysis) live in ``plans/extension_queries.py``; this package holds the
parts that are not SQL-expressible: the FTP commit protocol (K3/K4) and
the Pandas-UDF multimodal decode path.
"""
