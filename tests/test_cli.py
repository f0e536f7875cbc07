"""run.py CLI end-to-end (subprocess, CPU backend)."""

import json
import os
import subprocess
import sys

import pytest


def test_run_cli_end_to_end(synth_dir, tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "from mhrec_tpu.run import main; main()"
    )
    args = [
        sys.executable, "-c", code,
        "--config_file", "IDNet/hstu-size1.yaml", "overall/ID.yaml", "IDNet/hstu.yaml",
        # runtime knobs (reference run.py:176-187 allocator/TF32 surface)
        "--xla_flags=--xla_cpu_enable_fast_math=false",
        "--",
        "--matmul_precision", "highest",
        "--data_path", synth_dir["data_path"],
        "--dataset", synth_dir["name"],
        "--text_path", synth_dir["text_path"],
        "--MAX_ITEM_LIST_LENGTH", "12",
        "--train_batch_size", "8",
        "--eval_batch_size", "32",
        "--num_negatives", "64",
        "--n_layers", "1",
        "--n_heads", "2",
        "--item_embedding_size", "16",
        "--hstu_embedding_size", "16",
        "--total_iters", "3",
        "--eval_interval", "100",
        "--eval_pred_len", "2",
        "--pred_len", "1",
        "--topk", "[5,10]",
        "--tag_version", "v1",
        "--checkpoint_dir", str(tmp_path),
    ]
    proc = subprocess.run(
        args, env=env, capture_output=True, text=True, timeout=420,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "recall@10" in (proc.stdout + proc.stderr)


def test_reproduce_script_flags_are_known_keys():
    """Every --flag in reproduce/*.sh must be a config key the framework
    reads (in source via config[...] / config.get, or defined in a YAML) —
    guards the scripts against drifting from the config surface."""
    import re
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    source = ""
    for p in (repo / "mhrec_tpu").rglob("*.py"):
        source += p.read_text()
    for p in (repo / "mhrec_tpu" / "config" / "yamls").rglob("*.yaml"):
        source += p.read_text()

    cli_only = {"config_file", "data_path", "text_path", "dataset"}
    missing = {}
    for script in sorted((repo / "reproduce").glob("*.sh")):
        flags = re.findall(r"--([A-Za-z_][A-Za-z0-9_.]*)", script.read_text())
        for f in flags:
            key = f.split(".", 1)[0]  # dotted keys configure nested dicts
            if key in cli_only:
                continue
            if key not in source:
                missing.setdefault(script.name, []).append(f)
    assert not missing, f"unknown flags in reproduce scripts: {missing}"


def test_enable_compilation_cache_sets_jax_config(tmp_path, monkeypatch):
    """The persistent-compile-cache helper points jax at the requested
    directory (explicit arg > env > default) and returns it; run.py calls
    it unless ``compilation_cache: false``."""
    import jax

    from mhrec_tpu.utils.misc import enable_compilation_cache

    # snapshot EVERY config value the helper mutates (ADVICE r4: the old
    # try/finally restored only the cache dir, leaking the min-compile-time
    # and min-entry-size overrides into the rest of the pytest session)
    prev = {
        k: getattr(jax.config, k)
        for k in ("jax_compilation_cache_dir",
                  "jax_persistent_cache_min_compile_time_secs",
                  "jax_persistent_cache_min_entry_size_bytes")
    }
    try:
        explicit = tmp_path / "explicit"
        assert enable_compilation_cache(str(explicit)) == str(explicit)
        assert jax.config.jax_compilation_cache_dir == str(explicit)
        assert explicit.is_dir()

        via_env = tmp_path / "env"
        monkeypatch.setenv("MHREC_COMPILE_CACHE", str(via_env))
        assert enable_compilation_cache() == str(via_env)
        assert jax.config.jax_compilation_cache_dir == str(via_env)
    finally:
        for k, v in prev.items():
            jax.config.update(k, v)
