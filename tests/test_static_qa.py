"""Static QA: the Python analog of the reference's Aqua.jl test
(``/root/reference/test/test_aqua.jl``) — API surface consistency, importable
submodules, and docstring coverage of public names."""

import importlib
import pkgutil

import nowcastautogp_tpu as ngp


def test_all_exports_resolve():
    for name in ngp.__all__:
        assert hasattr(ngp, name), name


def test_all_submodules_import():
    for mod in pkgutil.walk_packages(ngp.__path__, prefix="nowcastautogp_tpu."):
        importlib.import_module(mod.name)


def test_public_callables_documented():
    for name in ngp.__all__:
        obj = getattr(ngp, name)
        if callable(obj) and not isinstance(obj, type):
            assert obj.__doc__, f"{name} lacks a docstring"


def test_no_accidental_reference_shadowing():
    # engine names must be our implementations, not re-exports of anything
    assert ngp.GPModel.__module__.startswith("nowcastautogp_tpu")
    assert ngp.GPConfig.__module__.startswith("nowcastautogp_tpu")
