"""Benchmark harnesses: streaming per-frame latency, int8 inference."""
