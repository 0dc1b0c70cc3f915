"""Source readers: schema enforcement, CSV delimiter sniffing (S6)."""

from __future__ import annotations

from ocr_parallel_spark.sources import read_embeddings, read_pages, read_targets_csv
from ocr_parallel_spark.sources.readers import sniff_delimiter


def test_read_targets_csv_sniffs_and_cleans(spark, tmp_path):
    p = tmp_path / "targets.csv"
    p.write_text(
        "Inmueble;FOLIO\n"
        "APARTAMENTO 101;AAA-1\n"
        ";AAA-2\n"          # empty name -> dropped (P3)
        "LOCAL 5;\n"        # empty ref -> dropped
        "GARAJE 9 ; BBB-3 \n"  # whitespace trimmed
    )
    assert sniff_delimiter(spark, str(p)) == ";"
    out = read_targets_csv(spark, str(p))
    rows = {(r.name, r.ref) for r in out.collect()}
    assert rows == {("APARTAMENTO 101", "AAA-1"), ("GARAJE 9", "BBB-3")}
    ids = [r.target_id for r in out.collect()]
    assert len(set(ids)) == len(ids) and all(i >= 0 for i in ids)


def test_read_targets_csv_missing_column_fails_loud(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("a,b\n1,2\n")
    import pytest

    with pytest.raises(ValueError, match="inmueble"):
        read_targets_csv(spark, str(p))


def test_read_pages_enforces_schema(spark, sf_dir, tmp_path):
    from ocr_parallel_spark.pages import synthesize_pages

    path = str(tmp_path / "pages")
    synthesize_pages(spark, sf_dir).write.parquet(path)  # has extra doc_id
    df = read_pages(spark, path)
    assert [f.name for f in df.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]
    assert df.count() > 0


def test_read_embeddings_types(spark, sf_dir):
    df = read_embeddings(spark, f"{sf_dir}/embeddings.parquet")
    assert df.schema["embedding"].dataType.simpleString() == "array<float>"
    assert df.count() > 0
