"""Guard the driver entry points on the virtual CPU mesh."""

import importlib.util
from pathlib import Path

import jax


def _load():
    spec = importlib.util.spec_from_file_location(
        "graft_entry", Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def test_entry_compiles_and_runs():
    module = _load()
    fn, args = module.entry()
    dists, idx = jax.jit(fn)(*args)
    assert dists.shape == (64, 10) and idx.shape == (64, 10)


def test_dryrun_multichip_eight_devices():
    module = _load()
    module.dryrun_multichip(8)
