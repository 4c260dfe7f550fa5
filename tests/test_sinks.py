"""Output sinks (S7/S8): JSON file sink with reference filename
sanitization, null sink."""

import json
import os

from crawler_spark.sources.sinks import doc_file_name, null_sink, write_docs_json


def test_doc_file_name_sanitization():
    # file.rb:25-44 semantics
    assert doc_file_name("https://www.example.com/a/b?q=1") == "example_com_a_b_q_1"
    assert doc_file_name("http://example.com/") == "example_com"
    assert doc_file_name("https://ex.com/a//b") == "ex_com_a_b"  # squeeze


def test_doc_file_name_long_url_middle_slice():
    url = "https://example.com/" + "x" * 400
    name = doc_file_name(url)
    assert len(name) <= 255
    assert name.startswith("example_com_")
    assert name.endswith("x")


def test_write_docs_json_and_null_sink(spark, tmp_path):
    df = spark.createDataFrame(
        [("a1", "https://site0.test/p/1", "Body one"),
         ("a2", "https://site0.test/p/2", "Body two")],
        "id string, url string, body string",
    )
    out = str(tmp_path / "docs_json")
    write_docs_json(df, out, coalesce=1)
    rows = []
    for fn in os.listdir(out):
        if fn.endswith(".json"):
            with open(os.path.join(out, fn)) as f:
                rows += [json.loads(line) for line in f if line.strip()]
    assert {r["id"] for r in rows} == {"a1", "a2"}
    assert all(r["doc_file_name"].endswith(".json") for r in rows)
    assert rows[0]["doc_file_name"].startswith("site0_test_p_")
    assert null_sink(df) == 2
