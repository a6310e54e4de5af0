#!/bin/sh
# Build the compiled-C++ parity harness against the reference headers
# (read-only include path) and the system OpenCV.
set -e
cd "$(dirname "$0")"
REF="${OIP_REFERENCE_DIR:-/root/reference/OpticalImageProcessor}"
test -f "$REF/preproc.h" || { echo "reference not found at $REF"; exit 3; }
CXXFLAGS="-O2 -std=c++17 -Wno-deprecated-declarations"
INCS="-Istubs -I$REF $(pkg-config --cflags opencv4)"
LIBS="$(pkg-config --libs opencv4)"
g++ $CXXFLAGS $INCS harness.cpp -o harness $LIBS
echo "built: $(pwd)/harness"
