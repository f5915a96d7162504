"""Python user-defined table functions (Spark 4 ``@udtf`` API).

The reference's only table-function shape is ``check_completeness``
(profile_table.py — one row per column), which this engine re-expresses
as a native one-pass aggregate (dq.py). This module covers the UDTF API
surface itself: a generator function usable in ``LATERAL`` position,
with Arrow-batched input/output (``useArrow=True``) so executor transfer
is columnar, not pickled row-at-a-time.

UDTFs remain Python-on-the-executor — the slow path. The rule from the
package docstring stands: anything expressible as native expressions
(explode/split here) should be; a UDTF earns its place only when the
per-row expansion needs real Python (stateful parsers, third-party
tokenizers). ``TokenizeUDTF`` is deliberately mirror-able in SQL so the
DuckDB oracle can verify the LATERAL plumbing end-to-end
(registry: ``udtf_tokenize_docs``).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos bigint, token string, n_chars bigint", useArrow=True)
class TokenizeUDTF:
    """One output row per whitespace token: (position, token, length).

    Tokenization matches the engine-wide convention exactly —
    ``split(trim(text), ' ')`` — so results zip against the SQL oracle:
    ``.strip(' ')`` (space-only, like SQL TRIM) then ``.split(' ')``
    (single-space separator, preserving empty tokens from runs, like
    Spark/DuckDB split).
    """

    def eval(self, text: str):  # noqa: D102 — generator contract
        if text is None:
            return
        for i, tok in enumerate(text.strip(" ").split(" ")):
            yield i, tok, len(tok)
