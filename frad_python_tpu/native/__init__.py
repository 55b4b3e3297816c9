"""C++ native fast paths (EGR, RS, CRC) loaded via ctypes."""
