"""Bench-artifact hygiene: the committed machine-readable artifacts parse,
cover every registered secondary bench, and carry the baseline columns the
README quotes (round-4 verdict items 2 and 7)."""
import ast
import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[2]


def _registered_bench_names():
    """Metric names registered in benchmarks/secondary.py, without
    importing it (import would initialize jax on the default backend)."""
    src = (REPO / "benchmarks" / "secondary.py").read_text()
    tree = ast.parse(src)
    metrics = set()
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Dict)
            and node.keys
            and all(
                isinstance(k, ast.Constant) and k.value == "metric"
                or not isinstance(k, ast.Constant)
                or isinstance(k.value, str)
                for k in node.keys
            )
        ):
            for k, v in zip(node.keys, node.values):
                if (
                    isinstance(k, ast.Constant)
                    and k.value == "metric"
                    and isinstance(v, ast.Constant)
                ):
                    metrics.add(v.value)
    return metrics


def test_bench_secondary_parses_and_covers_registry():
    artifact = json.loads((REPO / "BENCH_SECONDARY.json").read_text())
    assert "results" in artifact and artifact["results"], "empty artifact"
    recorded = {r["metric"] for r in artifact["results"] if "metric" in r}
    registered = _registered_bench_names()
    assert registered, "failed to parse registered bench names"
    missing = registered - recorded
    assert not missing, f"benches missing from BENCH_SECONDARY.json: {missing}"
    for r in artifact["results"]:
        assert "error" not in r, f"recorded failure: {r}"
        assert r.get("value", 0) > 0, f"non-positive value: {r}"


def test_bench_secondary_has_baseline_columns():
    """Every entry with a C++ twin carries vs_baseline + baseline_ms
    (round-4 verdict item 2)."""
    artifact = json.loads((REPO / "BENCH_SECONDARY.json").read_text())
    with_baseline = [r for r in artifact["results"] if "vs_baseline" in r]
    assert len(with_baseline) >= 7, (
        f"only {len(with_baseline)} entries carry vs_baseline"
    )
    for r in with_baseline:
        assert r["baseline_ms"] > 0
        assert r["vs_baseline"] > 0


def test_baseline_json_pins_flagship():
    pinned = json.loads((REPO / "BASELINE.json").read_text()).get(
        "pinned_baselines", {}
    )
    entry = pinned.get("cvi_dp_full_natgrad_step_100k_grid")
    assert entry and entry["seconds_per_step"] > 0, (
        "flagship C++ baseline not pinned in BASELINE.json"
    )
