"""Import the reference implementation at /root/reference with its
missing third-party deps (saxpy, loguru, scipy) stubbed by our vendored
kernels, so parity tests can execute the reference's actual algorithms
side-by-side with ours on identical inputs and random sequences.

The stubs are *our* kernels — independently verified bit-faithful to
the saxpy semantics against the reference's shipped golden artifacts
(see test_sax.py) — so this is a fair comparison of the algorithmic
layers, not circular.
"""

from __future__ import annotations

import sys
import types

import numpy as np

from kapra_spark.functions import sax as _sax

_REFERENCE_PATH = "/root/reference"


def _install_stubs() -> None:
    if "saxpy" in sys.modules:
        return

    saxpy = types.ModuleType("saxpy")
    m_znorm = types.ModuleType("saxpy.znorm")
    m_znorm.znorm = lambda series, znorm_threshold=0.01: _sax.znorm(series, znorm_threshold)
    m_paa = types.ModuleType("saxpy.paa")
    m_paa.paa = lambda series, paa_segments: _sax.paa(series, paa_segments)
    m_alpha = types.ModuleType("saxpy.alphabet")
    m_alpha.cuts_for_asize = _sax.cuts_for_asize
    m_strf = types.ModuleType("saxpy.strfunc")
    m_strf.idx2letter = lambda idx: chr(97 + idx)
    m_sax = types.ModuleType("saxpy.sax")
    m_sax.ts_to_string = lambda series, cuts: _sax.ts_to_string(series, cuts)
    m_sax.sax_by_chunking = lambda series, paa_size, alphabet_size, znorm_threshold=0.01: \
        _sax.sax_by_chunking(series, paa_size, alphabet_size, znorm_threshold)
    for name, mod in [("saxpy", saxpy), ("saxpy.znorm", m_znorm), ("saxpy.paa", m_paa),
                      ("saxpy.alphabet", m_alpha), ("saxpy.strfunc", m_strf),
                      ("saxpy.sax", m_sax)]:
        sys.modules[name] = mod

    loguru = types.ModuleType("loguru")

    class _Logger:
        def info(self, *a, **k):
            pass

        def error(self, *a, **k):
            pass

    loguru.logger = _Logger()
    sys.modules["loguru"] = loguru

    scipy = types.ModuleType("scipy")
    spatial = types.ModuleType("scipy.spatial")
    distance = types.ModuleType("scipy.spatial.distance")

    def _cosine(u, v):
        u = np.asarray(u, float)
        v = np.asarray(v, float)
        return 1.0 - float(np.dot(u, v)) / (float(np.linalg.norm(u)) * float(np.linalg.norm(v)))

    distance.cosine = _cosine
    spatial.distance = distance
    scipy.spatial = spatial
    # give the stubs real ModuleSpecs so importlib.util.find_spec
    # (used by pyspark's have_package) doesn't choke on them
    import importlib.machinery

    for name, mod in [("scipy", scipy), ("scipy.spatial", spatial),
                      ("scipy.spatial.distance", distance),
                      *[(n, sys.modules[n]) for n in list(sys.modules)
                        if n.startswith("saxpy") or n == "loguru"]]:
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        mod.__version__ = "0.0.0-stub"
        sys.modules[name] = mod


def load_reference():
    """Returns the reference's ``includes`` package, import-stubbed."""
    _install_stubs()
    if _REFERENCE_PATH not in sys.path:
        sys.path.insert(0, _REFERENCE_PATH)
    import includes.common  # noqa: F401
    import includes.k_anonymity  # noqa: F401
    import includes.l_diversity  # noqa: F401
    import includes.metric  # noqa: F401
    import includes.node  # noqa: F401
    import includes

    return includes
