"""Configs, profiling counters, misc utilities."""
