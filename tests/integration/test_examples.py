"""Execute the documentation examples end-to-end (the reference runs its 14
jupytext notebooks in CI the same way,
tests/integration/end_to_end/test_notebooks.py:77)."""
import pathlib
import runpy

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).parents[2] / "docs" / "examples").glob("*.py")
)


@pytest.mark.parametrize("example", EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(example):
    runpy.run_path(str(example), run_name="__main__")
