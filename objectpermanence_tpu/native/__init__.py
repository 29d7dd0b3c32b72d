"""Native (C++) runtime components, loaded via ctypes.

Compiled on demand with the system toolchain and cached next to the
sources; every native entry point has a pure-Python fallback so the
framework works without a compiler."""

from objectpermanence_tpu.native.build import load_ingest_library  # noqa: F401
