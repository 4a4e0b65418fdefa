"""Bucket-priority configuration: schema, parsing and validation.

Mirrors the reference's config surface (``BucketPriorityConfig.java:42-56``)
and its validation behavior (``BucketPriorityPartitioner.java:27-59``,
``BucketPriorityAssignor.java:34-75``), re-expressed as a Python
dataclass that the engine's routing / consumption entry points take:

- ``topic``      (required)          — the prioritized topic.
- ``buckets``    (required, list)    — bucket names, declaration order.
- ``allocation`` (required, list)    — percentages, parallel to
  ``buckets``; each item may carry a ``%`` suffix (stripped, as in
  ``BucketPriorityPartitioner.java:29-33``).
- ``bucket``     (consumer side)     — the bucket this consumer serves.
- ``delimiter``  (default ``"-"``)   — key splitter. NOTE: it is a
  **regex** (the reference passes it to ``String.split``; we pass it to
  ``F.split`` — same regex semantics). Users must escape regex
  metacharacters such as ``|``.
- ``on_unroutable`` — what to do with records whose key does not resolve
  to a configured bucket: ``"default"`` leaves the partition column NULL
  (Kafka sink's own partitioner decides — the reference's
  ``UNKNOWN_PARTITION`` fall-through, ``BucketPriorityPartitioner.java:64-81``)
  or ``"discard"`` drops them (the documented-but-unwired
  ``DiscardPartitioner``, ``DiscardPartitioner.java:15-18``; the
  README documents a ``fallback.partitioner`` key that no code reads —
  we implement the documented behavior behind this explicit flag).

Validation parity (error type and timing):

- buckets/allocation length mismatch → ``InvalidConfigurationException``
  at construction (``BucketPriorityPartitioner.java:34-37``).
- allocation sum ≠ 100 → ``InvalidConfigurationException`` at
  construction (``BucketPriorityPartitioner.java:38-42``).
- missing required key → ``ConfigException`` at construction (Kafka's
  ``ConfigDef`` behavior, ``BucketPriorityConfig.java:42-48``).
- too few partitions → raised lazily by the layout kernel on first
  route/assign, not here (``BucketPriorityPartitioner.java:98-105``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

__all__ = [
    "BucketPriorityConfig",
    "ConfigException",
    "InvalidConfigurationException",
    "DEFAULT_DELIMITER",
]

DEFAULT_DELIMITER = "-"


class ConfigException(ValueError):
    """A required configuration key is missing or malformed.

    Counterpart of Kafka's ``org.apache.kafka.common.config.ConfigException``
    raised by the reference's ``ConfigDef`` for absent required keys.
    """


class InvalidConfigurationException(ValueError):
    """Configuration present but semantically invalid.

    Counterpart of the reference's ``InvalidConfigurationException``
    (count mismatch, sum ≠ 100, too few partitions, bad fallback class).
    """


def _parse_allocation_item(item: str | int | float) -> int:
    """Parse one allocation entry, stripping an optional ``%`` suffix.

    The reference does ``value.replaceAll("%", "").trim()`` then
    ``Integer.parseInt`` (``BucketPriorityPartitioner.java:29-33``) —
    so ``"70%"``, ``" 70 "`` and ``70`` are all valid, ``"70.5"`` is not.
    """
    if isinstance(item, bool):
        raise InvalidConfigurationException(f"Invalid allocation value: {item!r}")
    if isinstance(item, int):
        return item
    text = str(item).replace("%", "").strip()
    try:
        return int(text)
    except ValueError as exc:
        raise InvalidConfigurationException(
            f"Invalid allocation value: {item!r} (expected an integer percentage)"
        ) from exc


@dataclass(frozen=True)
class BucketPriorityConfig:
    """Validated bucket-priority configuration.

    ``buckets_with_allocation()`` yields declaration-order
    ``(name, percent)`` pairs — the layout kernel's input.
    """

    topic: str
    buckets: tuple[str, ...]
    allocation: tuple[int, ...]
    bucket: str = ""
    delimiter: str = DEFAULT_DELIMITER
    on_unroutable: str = "default"
    fallback_assignor: str = "range"
    extra: dict = field(default_factory=dict, compare=False)

    def __init__(
        self,
        topic: str | None = None,
        buckets=None,
        allocation=None,
        bucket: str = "",
        delimiter: str = DEFAULT_DELIMITER,
        on_unroutable: str = "default",
        fallback_assignor: str = "range",
        **extra,
    ) -> None:
        if topic is None or str(topic).strip() == "":
            raise ConfigException(
                'Missing required configuration "topic" which has no default value.'
            )
        if buckets is None:
            raise ConfigException(
                'Missing required configuration "buckets" which has no default value.'
            )
        if allocation is None:
            raise ConfigException(
                'Missing required configuration "allocation" which has no default value.'
            )
        if isinstance(buckets, str):
            buckets = [b.strip() for b in buckets.split(",")]
        if isinstance(allocation, str):
            allocation = [a for a in allocation.split(",")]
        bucket_names = tuple(str(b).strip() for b in buckets)
        alloc_values = tuple(_parse_allocation_item(a) for a in allocation)

        # Message strings below are byte-identical to the reference's
        # InvalidConfigurationException texts
        # (BucketPriorityPartitioner.java:34-42, BucketPriorityAssignor.java:41-50).
        if len(bucket_names) != len(alloc_values):
            raise InvalidConfigurationException(
                "The bucket allocation doesn't match with the number of "
                "buckets configured."
            )
        if sum(alloc_values) != 100:
            raise InvalidConfigurationException(
                "The bucket allocation is incorrect. The sum of all buckets "
                "needs to be 100."
            )
        if len(set(bucket_names)) != len(bucket_names):
            raise InvalidConfigurationException(
                f"Bucket names must be unique: got {list(bucket_names)}."
            )
        if on_unroutable not in ("default", "discard"):
            raise InvalidConfigurationException(
                f"on_unroutable must be 'default' or 'discard', got {on_unroutable!r}."
            )
        if fallback_assignor not in ("range", "roundrobin"):
            # Exact reference text (BucketPriorityAssignor.java:57-58);
            # raised here at configure time, same lifecycle point.
            raise InvalidConfigurationException(
                "The fallback assignor configured is invalid."
            )
        if delimiter == "":
            raise InvalidConfigurationException("delimiter must be a non-empty regex.")

        object.__setattr__(self, "topic", str(topic))
        object.__setattr__(self, "buckets", bucket_names)
        object.__setattr__(self, "allocation", alloc_values)
        object.__setattr__(self, "bucket", str(bucket).strip())
        object.__setattr__(self, "delimiter", delimiter)
        object.__setattr__(self, "on_unroutable", on_unroutable)
        object.__setattr__(self, "fallback_assignor", fallback_assignor)
        object.__setattr__(self, "extra", dict(extra))

    def buckets_with_allocation(self) -> tuple[tuple[str, int], ...]:
        """Declaration-order ``(bucket, allocation)`` pairs."""
        return tuple(zip(self.buckets, self.allocation))

    @classmethod
    def from_options(cls, options: dict) -> "BucketPriorityConfig":
        """Build from Kafka-style dotted option keys.

        Accepts the reference's option names
        (``bucket.priority.topic``, ``.buckets``, ``.allocation``,
        ``.bucket``, ``.delimiter``) as well as the bare field names.
        """
        prefix = "bucket.priority."
        mapped: dict = {}
        passthrough: dict = {}
        for key, value in options.items():
            name = key[len(prefix):] if key.startswith(prefix) else key
            name = {"fallback.assignor": "fallback_assignor"}.get(name, name)
            if name == "fallback_assignor":
                # The reference configures this as a ConsumerPartitionAssignor
                # class name (BucketPriorityAssignor.java:51-58, default
                # RangeAssignor); map the known Kafka assignor classes to
                # the engine's kernel names, passing bare names through.
                text = str(value)
                if "RoundRobinAssignor" in text:
                    value = "roundrobin"
                elif "RangeAssignor" in text:
                    value = "range"
                mapped["fallback_assignor"] = value
            elif name == "fallback.partitioner":
                # The reference README documents this key for routing
                # discards (README.md:79-84) even though its code never
                # reads it; honor the documented intent here.
                mapped["on_unroutable"] = (
                    "discard" if "DiscardPartitioner" in str(value) else "default"
                )
            elif name in (
                "topic", "buckets", "allocation", "bucket",
                "delimiter", "on_unroutable", "fallback_assignor",
            ):
                mapped[name] = value
            else:
                passthrough[key] = value
        return cls(**mapped, **passthrough)
