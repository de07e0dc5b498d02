"""Python UDTFs — the SQL-surface extension point for row-expanding
operators (Spark 4 user-defined table functions, Arrow-optimized).

The engine's own operators stay built-in DataFrame compositions (the fast
path — see q_chunk_docs for the narrow chunker); a UDTF is the escape
hatch when a consumer needs a row-expanding transform callable FROM SQL
(`LATERAL chunk_udtf(text, n)`) without Python DataFrame code. Declared
with ``useArrow=True`` so the plan is ArrowEvalPythonUDTF (batched), not
row-at-a-time BatchEvalPythonUDTF — the registry-wide row-Python plan
gate applies to UDTFs too.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id: int, chunk: string", useArrow=True)
class ChunkUDTF:
    """Fixed-token-count chunking of a whitespace-tokenized text: emits
    (chunk_id, chunk) rows, last chunk ragged. The SQL-callable twin of
    the built-in chunker."""

    def eval(self, text: str, size: int):
        if text is None or size is None or size <= 0:
            return
        toks = text.split(" ")
        for i in range(0, len(toks), size):
            yield i // size, " ".join(toks[i : i + size])


def register_udtfs(spark) -> None:
    """Register every engine UDTF on the session (idempotent)."""
    spark.udtf.register("chunk_udtf", ChunkUDTF)
