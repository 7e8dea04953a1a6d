"""Shared DuckDB SQL fragments for the document/text oracles — kept
in a leaf module (no registry imports) so every registry_* module can
use them without creating an import cycle, whichever one Python loads
first."""

from __future__ import annotations

STOP_SQL = "('the', 'a', 'and', 'of', 'to', 'in')"

SQL_TOKS = r"""
toks_t AS (
    SELECT
        doc_id, lang, text,
        list_filter(string_split_regex(trim(text), '\s+'),
                    x -> x != '') AS toks
    FROM documents
)
"""
