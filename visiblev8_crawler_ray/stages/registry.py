"""Span-parser plugin registry — the user-extension surface.

The reference chains post-processors with a ``+``-joined string
(``-pp 'Mfeatures+adblock'`` -> Go binary ``-aggs`` flag,
``log_parser_worker/tasks.py:36``, README "Post-Processor
Integration").  Here a parser plugin is a named function
``docs_batch -> pa.Table``; a chain spec like ``"flow+mfeatures"``
appends one ``map_batches`` stage per plugin, each writing its own
output table.  Registering a new parser is one decorator — no engine
changes.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa

import ray.data as rd

PARSERS: dict[str, Callable[[pa.Table], pa.Table]] = {}


def parser(name: str):
    def wrap(fn):
        PARSERS[name] = fn
        return fn
    return wrap


def parse_chain(docs: rd.Dataset, spec: str) -> dict[str, rd.Dataset]:
    """Apply a '+'-joined parser chain; one output Dataset per parser.

    Unknown names raise immediately (the reference's Go binary fails the
    same way on a bad -aggs value)."""
    out: dict[str, rd.Dataset] = {}
    for name in spec.split("+"):
        name = name.strip()
        if not name:
            continue
        if name not in PARSERS:
            raise KeyError(
                f"unknown parser {name!r}; registered: {sorted(PARSERS)}")
        out[name] = docs.map_batches(PARSERS[name], batch_format="pyarrow")
    return out


# ---------------------------------------------------------------------------
# built-in parsers (the reference's 'flow' plus feature/adblock analogs)

from . import parse as _parse  # noqa: E402


@parser("flow")
def _flow(batch: pa.Table) -> pa.Table:
    """script_flow analog: script records with ordered api traces."""
    return _parse.parse_scripts_batch(batch)


@parser("mfeatures")
def _mfeatures(batch: pa.Table) -> pa.Table:
    """mega-usage facts: one row per g/s/c/n span."""
    return _parse.explode_usage_batch(batch)


@parser("spans")
def _spans(batch: pa.Table) -> pa.Table:
    """raw span explode (debug sink analog of parsed_log.output)."""
    return _parse.explode_spans_batch(batch)
