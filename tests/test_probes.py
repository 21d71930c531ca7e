"""The measurement probes under scripts/ are evidence artifacts — keep
them importable (and one runnable end-to-end at toy scale) so they do
not rot as the library evolves."""

import importlib.util
import pathlib

import pytest

SCRIPTS = sorted(
    p for p in (pathlib.Path(__file__).parent.parent / "scripts").glob("probe_*.py")
)


def _load(path):
    spec = importlib.util.spec_from_file_location(path.stem, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("path", SCRIPTS, ids=lambda p: p.stem)
def test_probe_imports(path):
    mod = _load(path)
    assert callable(getattr(mod, "main", None)), f"{path.stem} has no main()"
