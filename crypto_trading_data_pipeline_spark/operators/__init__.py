"""Operator library: DataFrame-in / DataFrame-out transforms.

Each module is pure (no IO, no session creation) so every operator works
unchanged on batch and streaming DataFrames — the engine's core design lever
(SURVEY.md §3 "Ours").
"""
