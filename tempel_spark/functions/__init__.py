"""Scalar / vectorized function library (SURVEY.md §2.8).

Everything here is either a native Column expression (JVM-side,
whole-stage-codegen) or an Arrow-vectorized pandas UDF — never a
row-at-a-time Python UDF (BASELINE.json input_hint mandate).
"""
