"""QAIG_COMPILER_OPTIONS: per-compile XLA options injected into every jit.

The hook is the only channel that reaches the TPU compiler through a
remote-backend relay (local XLA_FLAGS parsing aborts on TPU-only flags);
these tests pin the parse grammar and the jit-wrapping semantics without
needing any TPU-only option to be valid on the CPU backend.
"""

import jax
import jax.numpy as jnp
import pytest

from qaig_tpu.utils import compiler_options


def test_parse_grammar():
    assert compiler_options.parse("") == {}
    assert compiler_options.parse("a=1") == {"a": "1"}
    assert compiler_options.parse(" a = 1 , b = x=y ") == {"a": "1",
                                                           "b": "x=y"}
    # XLA_FLAGS-style bool spellings normalize to what XLA's option parser
    # accepts; numeric values are untouched
    assert compiler_options.parse("a=true,b=FALSE,c=0") == {
        "a": "True", "b": "False", "c": "0"}
    with pytest.raises(ValueError):
        compiler_options.parse("novalue")


def test_install_wraps_jit_and_merges(monkeypatch):
    captured = {}
    real_jit = jax.jit

    def fake_jit(fun, **kwargs):
        captured.update(kwargs)
        return real_jit(fun)

    monkeypatch.setattr(jax, "jit", fake_jit)
    monkeypatch.setattr(compiler_options, "_installed", None)
    compiler_options.install({"xla_fake_option": "7"})

    # plain call: options injected
    assert jax.jit(lambda x: x + 1)(jnp.ones(2))[0] == 2.0
    assert captured["compiler_options"] == {"xla_fake_option": "7"}

    # decorator-with-kwargs form + explicit options win key-by-key
    captured.clear()

    @jax.jit
    def f(x):
        return x * 2

    assert f(jnp.ones(2))[0] == 2.0
    assert captured["compiler_options"] == {"xla_fake_option": "7"}

    captured.clear()
    g = jax.jit(lambda x: x, static_argnums=(),
                compiler_options={"xla_fake_option": "9", "other": "1"})
    assert g(jnp.ones(2))[0] == 1.0
    assert captured["compiler_options"] == {"xla_fake_option": "9",
                                            "other": "1"}


def test_install_from_env_noop_without_var(monkeypatch):
    monkeypatch.delenv("QAIG_COMPILER_OPTIONS", raising=False)
    monkeypatch.setattr(compiler_options, "_installed", None)
    before = jax.jit
    assert compiler_options.install_from_env() == {}
    assert jax.jit is before  # untouched


def test_nested_jit_does_not_carry_options(monkeypatch):
    """XLA rejects compiler_options on a nested jit; the proxy must route
    nested calls through the plain program (which inlines) and only attach
    options at top level."""
    monkeypatch.setattr(compiler_options, "_installed", None)
    real_jit = jax.jit
    try:
        compiler_options.install(
        compiler_options.parse("xla_embed_ir_in_executable=false"))
        inner = jax.jit(lambda x: x * 2)

        @jax.jit
        def outer(x):
            return inner(x) + 1

        assert outer(jnp.ones(2))[0] == 3.0  # nested: must not raise
        assert inner(jnp.ones(2))[0] == 2.0  # top level: optioned program
        assert inner.lower(jnp.ones(2)) is not None  # attrs forward
    finally:
        jax.jit = real_jit


def test_installed_options_still_execute():
    # A benign (unknown keys rejected at compile time, so use none) empty
    # install must leave jit fully functional.
    compiler_options.install({})
    assert jax.jit(lambda x: (x @ x).sum())(jnp.eye(4)) == 4.0
