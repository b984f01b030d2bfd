"""The API-reference build (``make docs`` → docs/gen_api.py) must succeed
offline — the reference ships a Sphinx docs build (docs/conf.py, Makefile:10);
this environment has no sphinx, so the repo carries its own inspect-based
generator."""
import os
import subprocess
import sys


def test_make_docs_builds_api_reference(tmp_path):
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.join(root, "docs", "gen_api.py")],
        env=env, capture_output=True, text=True, cwd=root, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    api = os.path.join(root, "docs", "api")
    pages = os.listdir(api)
    assert "index.html" in pages and "examples.html" in pages
    # every subpackage gets a page
    for sub in ("models", "ops", "parallel", "kernels", "sde", "ssm",
                "likelihoods", "optim", "exp", "utils"):
        assert f"vi_diffusion_processes_tpu_{sub}.html" in pages, sub
    # pages carry real extracted content, not empty shells
    with open(os.path.join(api, "vi_diffusion_processes_tpu_models_cvi_dp.html")) as f:
        html = f.read()
    assert "CVISitesSDE" in html and "variational_cvi_sde.py" in html
