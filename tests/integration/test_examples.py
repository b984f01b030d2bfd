"""Execute the documentation examples end-to-end (the reference runs its 14
jupytext notebooks in CI the same way,
tests/integration/end_to_end/test_notebooks.py:77).

Each example gets a hard per-example timeout (SIGALRM) so one runaway
notebook cannot stall the whole suite; they also carry the ``slow`` marker
so ``-m 'not slow'`` gives a fast core run.
"""
import pathlib
import runpy
import signal

import pytest

EXAMPLES = sorted(
    (pathlib.Path(__file__).parents[2] / "docs" / "examples").glob("*.py")
)

import os

#: generous enough for a cold persistent-cache compile of the heaviest
#: example; warm runs finish in ≤30 s each
PER_EXAMPLE_TIMEOUT_S = int(os.environ.get("EXAMPLE_TIMEOUT_S", "420"))


class _Timeout(Exception):
    pass


@pytest.mark.slow
@pytest.mark.parametrize("example", EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(example):
    def _raise(signum, frame):
        raise _Timeout(f"{example.stem} exceeded {PER_EXAMPLE_TIMEOUT_S}s")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(PER_EXAMPLE_TIMEOUT_S)
    try:
        runpy.run_path(str(example), run_name="__main__")
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)
