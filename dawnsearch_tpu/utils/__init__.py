"""Utilities: logging/metrics, tracing, text helpers.

Reference counterparts: src/util.rs, the `debug`-gated println logging
convention, and the dormant `tracing` spans in src/embedding/model.rs.
"""
