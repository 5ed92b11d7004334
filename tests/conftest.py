"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set the env vars before anything imports jax, hence top-of-conftest.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# sitecustomize may have imported jax already (with JAX_PLATFORMS=axon baked
# into the config), so force the platform through the config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def import_reference_module(name):
    """Import a module from the PyTorch reference with its optional G2P deps stubbed.

    Only used to verify numerical parity in tests; never at runtime.
    """
    import types
    import importlib

    class _Stub(types.ModuleType):
        """Import succeeds (module-level reference imports work) but any
        attribute access raises ImportError, so runtime code that guards
        ``import x`` with try/except keeps behaving as if x were missing."""

        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            raise ImportError(f"stub module {self.__name__} has no {name}")

    # NB: matplotlib is genuinely installed in this image — do NOT stub it
    # (the inference plot path uses it for real; stubbing here leaked an
    # ImportError-raising module into unrelated tests).
    for stub in ["phonemizer", "phonemizer.backend", "dragonmapper",
                 "dragonmapper.transcriptions", "pypinyin", "librosa",
                 "librosa.display", "pyloudnorm", "soundfile", "torchaudio",
                 "torchaudio.transforms", "torch_complex", "torch_complex.tensor",
                 "parselmouth"]:
        if stub not in sys.modules:
            sys.modules[stub] = _Stub(stub)
    sys.modules["phonemizer.backend"].EspeakBackend = lambda **kw: None
    sys.modules["dragonmapper.transcriptions"].pinyin_to_ipa = lambda x: x
    sys.modules["pypinyin"].pinyin = lambda x: [[x]]
    sys.modules["librosa"].display = sys.modules["librosa.display"]

    class _StubComplexTensor:  # only isinstance-checked in Layers/STFT
        pass

    sys.modules["torch_complex.tensor"].ComplexTensor = _StubComplexTensor

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return importlib.import_module(name)
