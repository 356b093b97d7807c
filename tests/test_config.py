"""Config layering tests (reference semantics: tests/unit/test_config.py —
base+env YAML merge, env-var overrides, typed scalar parsing)."""

from data_pipeline_for_real_time_retail_analytics_spark.config import (
    deep_merge,
    env_overrides,
    load_config,
)


def _write(p, text):
    p.write_text(text)
    return str(p)


def test_base_env_merge(tmp_path):
    base = _write(
        tmp_path / "base.yaml",
        "database:\n  host: localhost\n  port: 5432\npipeline:\n  batch_size: 1000\n",
    )
    _write(tmp_path / "prod.yaml", "database:\n  host: prod-db\n")
    cfg = load_config(base, env="prod")
    assert cfg["database"]["host"] == "prod-db"  # overlay wins
    assert cfg["database"]["port"] == 5432  # base preserved
    assert cfg["pipeline"]["batch_size"] == 1000


def test_missing_env_overlay_is_ok(tmp_path):
    base = _write(tmp_path / "base.yaml", "a:\n  b: 1\n")
    assert load_config(base, env="nope")["a"]["b"] == 1


def test_env_var_overrides_and_types(tmp_path):
    base = _write(tmp_path / "base.yaml", "database:\n  port: 5432\n  debug: false\n")
    cfg = load_config(
        base,
        environ={
            "RETAILPIPE__DATABASE__PORT": "6543",
            "RETAILPIPE__DATABASE__DEBUG": "true",
            "RETAILPIPE__NEW_SECTION__RATIO": "1.5",
            "UNRELATED": "x",
        },
    )
    assert cfg["database"]["port"] == 6543  # typed int
    assert cfg["database"]["debug"] is True  # typed bool
    assert cfg["new_section"]["ratio"] == 1.5
    assert "unrelated" not in cfg


def test_env_var_beats_overlay(tmp_path):
    base = _write(tmp_path / "base.yaml", "db:\n  host: localhost\n")
    _write(tmp_path / "prod.yaml", "db:\n  host: prod-db\n")
    cfg = load_config(
        base, env="prod", environ={"RETAILPIPE__DB__HOST": "override-db"}
    )
    assert cfg["db"]["host"] == "override-db"


def test_deep_merge_lists_replace():
    assert deep_merge({"a": [1, 2]}, {"a": [3]})["a"] == [3]


def test_env_overrides_nesting():
    out = env_overrides("P", {"P__A__B__C": "7"})
    assert out == {"a": {"b": {"c": 7}}}
