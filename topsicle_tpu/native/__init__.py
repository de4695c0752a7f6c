"""ctypes bindings for the native host IO library (native/tsio.cc).

The library is compiled on demand with the system toolchain (g++ + zlib)
and cached next to the package; when the toolchain or zlib is missing,
callers fall back to the pure-Python reader transparently
(pipeline honors TopsicleConfig.native_io)."""

from topsicle_tpu.native.loader import (  # noqa: F401
    Block,
    NativeReader,
    native_available,
    write_subset_native,
)
