from __future__ import annotations

import pytest

from canal_spark.session import get_spark
from canal_spark.sources.changelog import ChangelogSpec, generate_changelog

UNIT_SPEC = ChangelogSpec(n_events=4_000, n_partitions=4, n_keys=300, seed=42)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="canal_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def changelog_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("changelog")
    return generate_changelog(str(d / "log"), UNIT_SPEC)


@pytest.fixture(scope="session")
def oracle_state(changelog_dir):
    from tests.oracle_replay import replay

    return replay(changelog_dir)


def assert_state_equals_oracle(engine_df, oracle_pdf):
    """Row-by-row token-array equality (the north-rule parity check,
    BASELINE.json:15)."""
    got = (
        engine_df.select("doc_id", "tokens", "n_tok", "source")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = oracle_pdf.sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(exp), f"row count {len(got)} != oracle {len(exp)}"
    assert list(got.doc_id) == list(exp.doc_id)
    assert list(got.n_tok) == list(exp.n_tok)
    assert list(got.source) == list(exp.source)
    for i, (g, e) in enumerate(zip(got.tokens, exp.tokens)):
        assert list(g) == list(e), f"token mismatch at row {i} ({got.doc_id[i]})"
