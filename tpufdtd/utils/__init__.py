"""Harness utilities: device peaks, perf models, statistics, CSV output."""
