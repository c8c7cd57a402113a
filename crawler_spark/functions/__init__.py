"""Vectorized (Arrow-batched) scalar functions of the engine.

Everything here is either a pure Column expression or a pandas UDF /
mapInPandas stage — never a row-at-a-time Python UDF (BASELINE.json
input_hint mandate).
"""
