"""Executes the tutorial notebooks' code cells end-to-end.

The reference ships its walkthroughs as colabs (``/root/reference/colabs/``:
sampling jax/pytorch, fine-tuning, GSM8K eval); ours live in ``notebooks/``
and — unlike the reference's, which need downloaded weights — run fully
offline on tiny random models, so CI executes them and they can never rot.
Each runs in a subprocess: notebooks own their jax platform config and the
GSM8K one imports an absl-flag-defining module.
"""

import json
import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
NOTEBOOKS = sorted((REPO / "notebooks").glob("*.ipynb"))

_RUNNER = """
import json, sys
nb = json.load(open(sys.argv[1]))
src = "\\n\\n".join(
    "".join(c["source"]) if isinstance(c["source"], list) else c["source"]
    for c in nb["cells"] if c["cell_type"] == "code")
exec(compile(src, sys.argv[1], "exec"), {"__name__": "__nb__"})
"""


def test_all_four_tutorials_present():
  names = {p.stem for p in NOTEBOOKS}
  assert {
      "sampling_tutorial_jax",
      "sampling_tutorial_pytorch",
      "fine_tuning_tutorial_jax",
      "gsm8k_eval",
  } <= names, names


@pytest.mark.parametrize("nb", NOTEBOOKS, ids=lambda p: p.stem)
def test_notebook_executes(nb):
  env = dict(os.environ)
  env["PALLAS_AXON_POOL_IPS"] = ""  # CPU: don't touch the TPU relay
  env["JAX_PLATFORMS"] = "cpu"
  env.pop("NOTEBOOK_USE_TPU", None)
  proc = subprocess.run(
      [sys.executable, "-c", _RUNNER, str(nb)],
      cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
  )
  assert proc.returncode == 0, (
      f"{nb.name} failed\nstdout:\n{proc.stdout[-3000:]}\n"
      f"stderr:\n{proc.stderr[-3000:]}"
  )
