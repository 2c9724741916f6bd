"""Process-wide XLA compiler options for every jitted program.

TPU-only XLA flags (``--xla_tpu_*``) normally travel via the ``XLA_FLAGS``
environment variable, but under a remote-backend relay (e.g. the axon
tunnel used on this host) the *local* process parses ``XLA_FLAGS`` and
aborts on flags its own jaxlib doesn't know, while the *remote* compiler —
the one that should see them — never does.  The supported channel is the
per-compile ``compiler_options`` argument of :func:`jax.jit`, which rides
inside the compile request.

``install(options)`` (or ``install_from_env()``, reading
``QAIG_COMPILER_OPTIONS="xla_tpu_scoped_vmem_limit_kib=65536,..."``)
wraps :func:`jax.jit` so every subsequent jit in the process carries the
options.  Explicit ``compiler_options`` at a call site win key-by-key.

This is the tuning hook behind ``bench.py``'s XLA-flag sweeps; it is a
no-op unless explicitly enabled (bad option names fail at compile time
with XLA's own error, same as a bad ``XLA_FLAGS`` would).
"""

import functools
import os

_ENV_VAR = "QAIG_COMPILER_OPTIONS"
_installed = None  # dict of active options, or None


def parse(spec: str) -> dict:
    """``"k1=v1,k2=v2"`` -> ``{"k1": "v1", "k2": "v2"}`` (whitespace ok)."""
    options = {}
    for item in spec.split(","):
        item = item.strip()
        if not item:
            continue
        if "=" not in item:
            raise ValueError(
                f"{_ENV_VAR}: expected key=value, got {item!r}")
        key, value = item.split("=", 1)
        value = value.strip()
        # XLA's option parser only accepts Python-style bool spellings
        # ("True"/"False"); accept the XLA_FLAGS-style ones too.
        if value.lower() == "true":
            value = "True"
        elif value.lower() == "false":
            value = "False"
        options[key.strip()] = value
    return options


class _JitProxy:
    """Calls the optioned program at top level, the plain one when the call
    happens inside another trace — XLA only accepts ``compiler_options`` on
    a TOP-LEVEL jit, but the same jitted callable is routinely both called
    directly and inlined into an enclosing jit (e.g. the decode engine's
    per-segment programs inside the pipeline program)."""

    def __init__(self, plain, optioned):
        self._plain = plain
        self._optioned = optioned
        functools.update_wrapper(self, plain, updated=())

    def __call__(self, *args, **kwargs):
        from jax._src import core
        if core.trace_state_clean():
            return self._optioned(*args, **kwargs)
        return self._plain(*args, **kwargs)  # nested: inlines into the trace

    def __getattr__(self, name):  # .lower / .clear_cache / .trace / ...
        return getattr(object.__getattribute__(self, "_optioned"), name)


def install(options: dict) -> None:
    """Make every future ``jax.jit`` carry ``compiler_options=options``."""
    global _installed
    import jax

    if not options:
        return
    if _installed is not None:
        _installed.update(options)
        return
    _installed = dict(options)
    inner_jit = jax.jit

    @functools.wraps(inner_jit)
    def jit_with_options(fun=None, **kwargs):
        if fun is None:  # decorator-with-kwargs form
            return functools.partial(jit_with_options, **kwargs)
        merged = dict(_installed)
        merged.update(kwargs.pop("compiler_options", None) or {})
        return _JitProxy(inner_jit(fun, **kwargs),
                         inner_jit(fun, compiler_options=merged, **kwargs))

    jax.jit = jit_with_options


def install_from_env() -> dict:
    """Install options from ``QAIG_COMPILER_OPTIONS`` if set; return them."""
    spec = os.environ.get(_ENV_VAR, "")
    options = parse(spec) if spec else {}
    install(options)
    return options
