"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API).

``synthetic_docs`` generates a deterministic document corpus of any
size directly inside the executors — the scale-testing path when the
shipped parquet fixtures top out at sf0.1. Generation is a pure
function of ``doc_id`` (Knuth multiplicative hashing over a fixed
vocabulary — no RNG state, no seed coordination), so the SAME rows
come back for any partition count, executor count, or retry: a task
that is re-executed after failure regenerates identical data, which
keeps downstream exactly-once semantics intact.

Scale shape: ``partitions()`` splits the id range into contiguous
slices; each executor materializes only its slice, so a 10^12-row
corpus needs no driver memory and no storage. This mirrors how the
engine would wrap any external record service as a first-class Spark
source (the modern replacement for the reference's driver-side file
collection loop, upload_to_s3.py:63-83).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: fixed vocabulary — same spirit as the driver's synthetic documents
VOCAB: Sequence[str] = (
    "data spark batch stream row column table scan join hash agg sort "
    "key value part order line item fast slow window group shuffle "
    "broadcast filter map reduce merge split"
).split()

_PRIME = 2654435761
_MASK = (1 << 63) - 1

LANGS = ("en", "en", "en", "de", "fr", "es", "zh")  # en-heavy mix


def _mix(x: int) -> int:
    return (x * _PRIME) & _MASK


def _doc_text(doc_id: int) -> str:
    h = _mix(doc_id + 1)
    n_tokens = 20 + h % 80
    toks = []
    for i in range(n_tokens):
        h = _mix(h + i + 1)
        toks.append(VOCAB[h % len(VOCAB)])
    return " ".join(toks)


def _doc_row(doc_id: int) -> tuple[int, str, str, str, int]:
    text = _doc_text(doc_id)
    h = _mix(doc_id + 7)
    lang = LANGS[h % len(LANGS)]
    source = f"src{h % 20}"
    return (doc_id, text, lang, source, len(text))


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.n_partitions = int(options.get("partitions", 8))

    def partitions(self) -> list[InputPartition]:
        step = max(1, -(-self.rows // self.n_partitions))
        return [
            _RangePartition(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for doc_id in range(partition.start, partition.end):
            yield _doc_row(doc_id)


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("rows", N).load()``"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return (
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint"
        )

    def reader(self, schema) -> SyntheticDocsReader:
        return SyntheticDocsReader(self.options)


def register(spark) -> None:
    """Idempotently register the data source on a session."""
    spark.dataSource.register(SyntheticDocsDataSource)


#: DuckDB rendering of :func:`_mix` — HUGEINT keeps the 95-bit product
#: exact before the mod-2^63 reduction (``x & MASK`` == ``x % 2^63``
#: for the non-negative values this generator produces).
_MIX_SQL = "CAST((CAST({x} AS HUGEINT) * 2654435761) % 9223372036854775808 AS BIGINT)"


def oracle_corpus_cte(n_rows: int) -> str:
    """WITH-clause body that REGENERATES this source's corpus in DuckDB.

    The generator is pure integer arithmetic, so a recursive CTE can
    replay the per-token hash recurrence (h := mix(h + i + 1)) exactly
    — which makes queries over the custom data source value-checkable
    end to end (generation + transformation), not just rows-counted.
    Yields a ``docs(doc_id, text, lang, source, n_chars)`` relation
    matching :func:`_doc_row` bit-for-bit (verified in
    tests/test_embeddings_and_pydatasource.py).
    """
    vocab_sql = "[" + ", ".join(f"'{w}'" for w in VOCAB) + "]"
    langs_sql = "[" + ", ".join(f"'{lang}'" for lang in LANGS) + "]"
    return f"""
    ids AS (
      SELECT range AS doc_id, {_MIX_SQL.format(x='range + 1')} AS h0
      FROM range(0, {n_rows})
    ),
    gen AS (
      SELECT doc_id, h0 AS h, -1 AS i, CAST(NULL AS VARCHAR) AS tok,
             20 + h0 % 80 AS n_tokens
      FROM ids
      UNION ALL
      SELECT doc_id, {_MIX_SQL.format(x='h + i + 2')}, i + 1,
             {vocab_sql}[({_MIX_SQL.format(x='h + i + 2')} % {len(VOCAB)}) + 1],
             n_tokens
      FROM gen WHERE i + 1 < n_tokens
    ),
    texts AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS text
      FROM gen WHERE i >= 0 GROUP BY doc_id
    ),
    docs AS (
      SELECT t.doc_id, t.text,
             {langs_sql}[({_MIX_SQL.format(x='t.doc_id + 7')} % {len(LANGS)}) + 1]
               AS lang,
             'src' || CAST({_MIX_SQL.format(x='t.doc_id + 7')} % 20 AS VARCHAR)
               AS source,
             CAST(length(t.text) AS BIGINT) AS n_chars
      FROM texts t
    )"""
