"""Small shared runtime helpers."""
from __future__ import annotations

import logging


class _EmptyBlockSchemaFilter(logging.Filter):
    """Drop Ray Data's ``RefBundle with a different schema`` warning ONLY in
    its empty-schema form (``new schema: .``).

    Root cause (verified by instrumentation, not guessed): the sort-based
    shuffle behind ``groupby().map_groups()`` emits 0-row, schema-less
    blocks whenever a range partition contains no groups — which is
    guaranteed to happen when sort partitions exceed distinct bucket keys
    (e.g. 32 ``bk`` values across ~200 read blocks), regardless of any
    pre-repartition (sampled range boundaries can always produce empty
    ranges).  The group UDFs here are never called for those blocks, so
    returning typed empty tables from them cannot help.  An empty block
    unifies with any schema downstream, so the message is cosmetic noise
    in this engine.  A REAL schema divergence (a non-empty ``new schema``)
    still logs normally.
    """

    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        msg = record.getMessage()
        return not ("different schema" in msg and "new schema: ." in msg)


_installed = False


def install_log_filters() -> None:
    """Install the empty-block schema-warning filter once per process."""
    global _installed
    if _installed:
        return
    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptyBlockSchemaFilter())
    _installed = True
