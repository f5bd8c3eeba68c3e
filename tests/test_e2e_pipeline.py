"""End-to-end pipeline: randomize -> datagen -> train -> export -> eval.

The CLI equivalent of the reference's full workflow (create_scene.py ->
train.sh/data_gen -> preprocess.py -> train.py -> convert_to_torchscript.py
-> test.py), run at miniature scale through the real entry points.
"""
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ,
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
               JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, "-m", "ai_path_tracer_denoiser_tpu.app",
                        *args], cwd=cwd, env=env, capture_output=True,
                       text=True, timeout=420)
    assert r.returncode == 0, f"{args}\nstdout:{r.stdout}\nstderr:{r.stderr}"
    return r.stdout


def test_full_pipeline(tmp_path):
    d = str(tmp_path)
    _run(["randomize", os.path.join(REPO, "scenes/template_random.txt"),
          "--count", "1", "--out-dir", "gen"], d)
    scene = os.path.join(d, "gen", os.listdir(os.path.join(d, "gen"))[0])

    _run(["datagen", scene, "--out-dir", "data", "--frames", "8",
          "--gt-spp", "4", "--res", "32", "--platform", "cpu"], d)
    inputs = os.listdir(os.path.join(d, "data", "input"))
    # datagen defaults to TWO camera pans (the reference's mov axis)
    assert len(inputs) == 8 * 2
    assert any("_1_0_" in f for f in inputs)   # second pan present
    x = np.load(os.path.join(d, "data", "input", inputs[0]))
    assert x.shape == (32, 32, 10)

    _run(["train", "--data-dir", "data", "--epochs", "1", "--crop-size", "32",
          "--model-dir", "m", "--log-dir", "logs", "--platform", "cpu"], d)
    assert os.path.exists(os.path.join(d, "m", "model_final.npz"))
    assert os.path.exists(os.path.join(d, "logs", "metrics.jsonl"))

    _run(["export", os.path.join(d, "m", "model_final.npz"),
          "--out", os.path.join(d, "deploy.npz")], d)

    _run(["eval", "--data-dir", "data", "--model", os.path.join(d, "deploy.npz"),
          "--out-dir", "eval_out", "--max-sequences", "1",
          "--platform", "cpu"], d)
    out = os.listdir(os.path.join(d, "eval_out"))
    assert out, "eval produced no output"
