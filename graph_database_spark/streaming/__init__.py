"""Structured Streaming variants of the event operators (SURVEY.md §2.9).

The reference has no streaming surface; these exist because the engine's
event operators (operators/events.py) have natural incremental forms —
watermarked tumbling windows and session windows — and a 100 TB pipeline
ingests events continuously.
"""
