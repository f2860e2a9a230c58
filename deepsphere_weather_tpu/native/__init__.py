"""Native (C++) acceleration layer.

The reference delegates geometry-heavy setup work to native binaries (CDO's
conservative remapping, libigl's cotan Laplacian — SURVEY.md §2.13). This
package hosts the framework's own C++ equivalents, exposed via ctypes, with
pure-numpy fallbacks so the framework works without a compiled library.

Build with:  python -m deepsphere_weather_tpu.native.build
"""
