"""Packaging metadata stays consistent with the package.

The wheel itself is exercised out-of-band (`pip wheel . --no-deps`);
these tests statically validate what the suite can check cheaply:
every console-script target resolves to a callable, the declared
package list matches the source tree, and the version is single-sourced.
"""

import importlib
import os

import pytest

try:
    import tomllib  # stdlib on 3.11+
except ModuleNotFoundError:  # pragma: no cover - 3.10 (requires-python >= 3.10)
    tomllib = pytest.importorskip("tomli")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pyproject():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_script_targets_resolve(pyproject):
    scripts = pyproject["project"]["scripts"]
    # one per reference entry point + the serving exporter
    assert len(scripts) == 9
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        func = getattr(mod, func_name)
        assert callable(func), f"{name} -> {target} is not callable"
        # entry points are invoked with no arguments
        import inspect

        sig = inspect.signature(func)
        required = [
            p
            for p in sig.parameters.values()
            if p.default is inspect.Parameter.empty
            and p.kind
            in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD, p.KEYWORD_ONLY)
        ]
        assert not required, f"{name} -> {target} requires arguments {required}"


def test_console_scripts_answer_help(pyproject):
    # every entry point must accept an argv list and exit 0 on --help
    # (finetune/pretrain parsers are add_help=False composables; their
    # cli() wrappers re-add help like the reference's __main__ blocks do)
    import contextlib
    import io

    for name, target in pyproject["project"]["scripts"].items():
        mod_name, func_name = target.split(":")
        func = getattr(importlib.import_module(mod_name), func_name)
        buf = io.StringIO()
        with pytest.raises(SystemExit) as exc:
            with contextlib.redirect_stdout(buf):
                func(["--help"])
        assert exc.value.code == 0, f"{name} --help exited {exc.value.code}"
        assert "--help" in buf.getvalue() or "-h" in buf.getvalue()


def test_declared_packages_match_tree(pyproject):
    declared = set(pyproject["tool"]["setuptools"]["packages"])
    found = set()
    for dirpath, _dirnames, filenames in os.walk(os.path.join(REPO, "tpat_tpu")):
        if "__init__.py" in filenames:
            rel = os.path.relpath(dirpath, REPO).replace(os.sep, ".")
            found.add(rel)
    assert declared == found


def test_version_single_sourced(pyproject):
    import tpat_tpu

    assert pyproject["project"]["dynamic"] == ["version"]
    attr = pyproject["tool"]["setuptools"]["dynamic"]["version"]["attr"]
    assert attr == "tpat_tpu.__version__"
    assert isinstance(tpat_tpu.__version__, str) and tpat_tpu.__version__


def test_native_package_data_path_matches_loader(pyproject):
    # the wheel ships the .so where tpat_tpu/data/native.py looks for it
    pkg_data = pyproject["tool"]["setuptools"]["package-data"]
    assert pkg_data["tpat_tpu.data"] == ["libtpat_audio.so"]
    from tpat_tpu.data import native

    in_pkg = [
        p
        for p in native._LIB_PATHS
        if os.path.dirname(p) == os.path.dirname(os.path.abspath(native.__file__))
    ]
    assert in_pkg, "native loader must search next to tpat_tpu/data/native.py"
