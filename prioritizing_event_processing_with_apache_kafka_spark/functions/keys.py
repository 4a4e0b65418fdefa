"""Record-key parsing expressions.

The bucket name is the first delimiter-separated token of the record
key, trimmed (reference: ``BucketPriorityPartitioner.java:69-73``;
valid key shapes per ``README.md:65-69`` — ``"Platinum"``,
``"Platinum-001"``, ``"Platinum-Group01-001"``).

Implemented as a pure Column expression so it stays inside whole-stage
codegen on the scan→route hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["extract_bucket"]


def extract_bucket(key, delimiter: str = "-") -> Column:
    """Bucket name from a record key: ``trim(split(key, delimiter)[0])``.

    ``delimiter`` is a **regex** — both Java's ``String.split`` (the
    reference) and Spark's ``split`` treat it as one, so the semantics
    line up exactly, including the footgun that ``"|"`` must be escaped.

    NULL keys yield NULL. This expression stringifies whatever column
    it is handed (``cast('string')``); the *type* gate — the
    reference's ``key instanceof String`` bypass for non-string keys
    (``BucketPriorityPartitioner.java:69,80-81``) — lives in
    ``operators.routing.route``, which checks the column's data type
    and substitutes ``lit(NULL)`` for non-string/non-binary key
    columns before this expression ever runs. Callers using this
    function directly on a numeric column get the stringified form.
    A key with no delimiter at all is its own bucket name
    (``split`` returns a single-element array).
    """
    col = F.col(key) if isinstance(key, str) else key
    return F.trim(F.split(col.cast("string"), delimiter).getItem(0))
