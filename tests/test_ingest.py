"""JSONL/CSV corpus ingestion: declared schema, lossless quarantine,
documents-contract output (sources/ingest.py)."""

import pyspark.sql.functions as F

from sfguide_getting_started_openflow_postgresql_cdc_spark.sources.ingest import (
    read_documents_csv,
    read_documents_jsonl,
)


def test_jsonl_ingest_splits_good_and_quarantine(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web"}',
                '{"doc_id": 2, "text": "salut"}',            # defaults filled
                'this is not json at all',                    # parse failure
                '{"doc_id": null, "text": "orphan"}',         # missing required
                '{"doc_id": 4, "text": null, "lang": "en"}',  # missing required
                '{"doc_id": "five", "text": "typed wrong"}',  # wrong-typed PK
                '{"doc_id": 6, "text": "ok", "lang": "fr", "source": "books"}',
            ]
        )
    )
    docs, quarantine = read_documents_jsonl(spark, str(p))

    rows = {r["doc_id"]: r for r in docs.collect()}
    assert set(rows) == {1, 2, 6}
    # contract shape matches the parquet loader's documents table
    assert docs.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    assert rows[1]["n_chars"] == len("hello world")
    assert (rows[2]["lang"], rows[2]["source"]) == ("und", "unknown")
    assert rows[6]["source"] == "books"

    q = [r["raw_line"] for r in quarantine.collect()]
    assert len(q) == 4  # nothing dropped: 7 lines in = 3 good + 4 kept
    assert any("not json" in line for line in q)

    # downstream operators run on the ingested frame unchanged
    n = docs.agg(F.sum("n_chars").alias("s")).collect()[0]["s"]
    assert n == sum(len(t) for t in ("hello world", "salut", "ok"))


def test_csv_ingest_same_contract(spark, tmp_path):
    p = tmp_path / "corpus.csv"
    p.write_text(
        "doc_id,text,lang,source\n"
        "1,alpha beta,en,web\n"
        "2,gamma,,\n"
        "x,not-a-number,en,web\n"
    )
    docs, quarantine = read_documents_csv(spark, str(p))
    rows = {r["doc_id"]: r for r in docs.collect()}
    assert set(rows) == {1, 2}
    assert rows[2]["lang"] == "und" and rows[2]["source"] == "unknown"
    assert quarantine.count() == 1


def test_engine_ingest_documents_facade(spark, tmp_path):
    """Engine.ingest_documents wires the typed readers into the facade:
    good rows come back (and register as a queryable view), malformed
    lines are preserved, unknown formats refuse."""
    import pytest

    from sfguide_getting_started_openflow_postgresql_cdc_spark.engine import Engine

    p = tmp_path / "c.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello", "lang": "en", "source": "w"}\n'
        "garbage line\n"
    )
    eng = Engine(spark, str(tmp_path / "wh"), write_partitions=1)
    docs, bad = eng.ingest_documents(str(p), view="ingested_docs")
    assert docs.count() == 1 and bad.count() == 1
    assert (
        spark.sql("SELECT COUNT(*) AS n FROM ingested_docs").collect()[0]["n"]
        == 1
    )
    with pytest.raises(ValueError, match="unknown ingest format"):
        eng.ingest_documents(str(p), fmt="xml")
