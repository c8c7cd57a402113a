"""Relational operators of the engine (frontier, seen-set, politeness,
filter cascade, KB feedback, dedup, similarity, text stats)."""
