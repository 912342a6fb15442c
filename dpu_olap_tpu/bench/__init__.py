"""Benchmark harness (Google Benchmark analog).

Counters follow the reference: items/s, bytes/s, per-phase ms (SURVEY §6),
emitted as JSON (scripts/parse_results.py consumes them into CSV).
"""

from .harness import BenchResult, run_benchmark, time_fn  # noqa: F401
