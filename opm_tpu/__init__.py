"""opm_tpu — TPU-native reservoir-simulation framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of
OPM/opm-simulators-legacy (fully-implicit three-phase black-oil simulation,
sequential-implicit and reordering transport, incompressible two-phase,
polymer flooding, and flow diagnostics).

The implementation lives in the sibling directory ``opm-simulators-legacy_tpu/``
(the project-mandated name, which is not a valid Python identifier); this
package binds that directory to the importable name ``opm_tpu`` by pointing
``__path__`` at it.
"""

import os as _os

_here = _os.path.dirname(_os.path.abspath(__file__))
_impl = _os.path.join(_os.path.dirname(_here), "opm-simulators-legacy_tpu")
if not _os.path.isdir(_impl):  # installed layout: impl dir nested inside
    _impl = _os.path.join(_here, "opm-simulators-legacy_tpu")
__path__ = [_impl]

# Default to float64 numerics (reservoir pressures ~1e7 Pa need it; the
# reference is double-precision throughout, with an optional single-precision
# linear-solve path that we mirror in linalg/). Opt out with OPM_TPU_X64=0.
if _os.environ.get("OPM_TPU_X64", "1") != "0":
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the fused-substep graphs are large and (on
# tunneled TPU setups) remote-compiled — caching makes repeat runs start in
# seconds instead of minutes. Opt out with OPM_TPU_COMPILATION_CACHE=0.
if _os.environ.get("OPM_TPU_COMPILATION_CACHE", "1") != "0":
    import jax as _jax

    try:
        _cache = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.expanduser("~/.cache/opm_tpu_jax_cache"))
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        # persist EVERYTHING: through the axon tunnel even sub-second
        # compiles cost ~0.5-1 s each, and the eager/EQUIL fragments alone
        # number ~100 (63 s of a cold SPE1 run was tiny-compile time)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           0.0)
    except Exception:
        pass

__version__ = "0.1.0"
