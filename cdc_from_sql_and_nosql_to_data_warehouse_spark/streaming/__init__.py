"""Structured Streaming CDC core (SURVEY.md §2.1 A9-A19, §2.2 B31-B38).

Populated by streaming.cdc (change-event envelope, append/merge apply
modes, snapshot∪CDC) and streaming.windows (tumbling/sliding/session
windows, watermark dedup, stream-static join).
"""
