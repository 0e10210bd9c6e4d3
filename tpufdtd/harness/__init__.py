"""Benchmark harness: correctness phase + performance phase + CSV output
(the reference's main.cpp L3 layer, SURVEY.md §2.1)."""
