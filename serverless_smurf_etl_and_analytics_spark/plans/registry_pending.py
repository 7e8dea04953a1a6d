"""Staging area for queries awaiting the NEXT verify-window rotation.

Rotation contract (see ``__spark_entry__._VERIFY_FIRST``): a query
registered in the live registry must have a driver-verified green
CORRECTNESS row; when a round's 50-query window is already full of
changed plans, new queries wait here. They still get the full
oracle-parity gate locally — tests/test_parity.py parametrizes over
PENDING exactly like the live registry, at sf0.001.

Promotion = move the ``pending()`` call into registry_ml.py /
registry.py as a ``register()`` call and list the name first in
``_VERIFY_FIRST``.

r4 status: EMPTY — t7_repetition_filter, t8_doc_frequency and
pack1_sequence_packing were promoted into registry_ml.py this round
(their staged r3 definitions moved verbatim), alongside the new
c1_kmeans_clusters.
"""

from __future__ import annotations

from .registry import QueryFn

PENDING_QUERIES: dict[str, QueryFn] = {}
PENDING_ORACLES: dict[str, str] = {}


def pending(name: str, fn: QueryFn, sql: str | None = None) -> None:
    PENDING_QUERIES[name] = fn
    if sql is not None:
        PENDING_ORACLES[name] = sql
