"""Dataset input: depth-PNG sequences (VolumeDeform layout) and synthetic scenes.

Replaces the reference's OpenCV PNG reading (apps/demo.cpp:80-88) and OpenNI
capture (kfusion/src/capture.cpp). The native C++ fast path for PNG decoding
lives in native/ with a ctypes binding in ``io.native_loader``.
"""
