import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from crawler_spark.session import get_spark

    s = get_spark("crawler-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    from crawler_spark.fixtures.gen import generate_corpus

    rows, cfg = generate_corpus(n_hosts=3, pages_per_host=30)
    return rows, cfg


@pytest.fixture(scope="session")
def crawl_config(corpus):
    from crawler_spark.config import CrawlConfig

    _rows, cfg = corpus
    return CrawlConfig(
        seed_urls=tuple(cfg["seed_urls"]),
        sitemap_urls=tuple(cfg["sitemap_urls"]),
        crawl_rules=cfg["crawl_rules"],
        binary_content_extraction_enabled=True,
        binary_content_extraction_mime_types=tuple(
            cfg.get("binary_content_extraction_mime_types", ())
        ),
        extraction_rules=cfg.get("extraction_rules", {}),
    )


@pytest.fixture(scope="session")
def pages_path(corpus, tmp_path_factory):
    from crawler_spark.fixtures.gen import write_parquet

    rows, _cfg = corpus
    p = tmp_path_factory.mktemp("pages") / "pages.parquet"
    write_parquet(rows, str(p))
    return str(p)
