"""Python UDTF surface (SURVEY §2.J UDTF row).

The reference has no table functions; this proves the engine surface
with a deterministic one: ``chunk_text`` splits a document into
fixed-token chunks with overlap — the same semantics as the
DataFrame-native tx5 operator (operators/text.py), expressed as a
lateral table function so SQL users can ``SELECT ... FROM doc,
LATERAL chunk_text(text, 16, 4)``.

UDTFs run row-at-a-time in Python — the DataFrame-native tx5 plan is
the 100 TB path; the UDTF exists for surface completeness and ad-hoc
SQL ergonomics, not the hot loop (the whole-registry plan gate keeps
BatchEvalPython out of registered queries).

The UDTF class is BUILT INSIDE a factory, never at module level:
cloudpickle serializes an importable module-level class by REFERENCE,
which requires executors to import this repo — and workers on a real
cluster don't have the repo on their import path (the project-wide
worker-shipping rule). A class defined in function scope pickles by
VALUE, shipping self-contained bytecode."""

from __future__ import annotations

from pyspark.sql.functions import udtf


def make_chunk_text():
    """Build the ``chunk_text`` UDTF: (text, chunk_size, overlap) ->
    one row per chunk: whitespace tokens windowed with ``chunk_size``
    and stride ``chunk_size - overlap`` (the tx5 contract)."""

    @udtf(returnType="chunk_id: int, chunk_text: string, n_tokens: int")
    class chunk_text:  # noqa: N801 — SQL-visible name
        def eval(self, text: str, chunk_size: int = 16, overlap: int = 4):
            if text is None:
                return
            toks = text.split()
            if not toks:
                return
            stride = max(chunk_size - overlap, 1)
            cid = 0
            for start in range(0, len(toks), stride):
                window = toks[start : start + chunk_size]
                yield cid, " ".join(window), len(window)
                cid += 1
                if start + chunk_size >= len(toks):
                    break

    return chunk_text


def register(spark) -> None:
    """Expose the table function to SQL as ``chunk_text``."""
    spark.udtf.register("chunk_text", make_chunk_text())
