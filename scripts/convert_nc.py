"""Convert a NetCDF4/HDF5 bathymetry input into the .rawnc sidecar consumed
by refbuild/stub/netcdf_stub.cpp (simple named-array container)."""
import struct
import sys

import h5py
import numpy as np


def convert(src: str, dst: str) -> None:
    with h5py.File(src, "r") as f:
        entries = []
        for name in ("_lat_subset", "_lon_subset", "z"):
            arr = np.asarray(f[name][:])
            dt = 0 if arr.dtype == np.float64 else 1
            arr = arr.astype(np.float64 if dt == 0 else np.float32)
            entries.append((name, dt, arr))
    with open(dst, "wb") as out:
        out.write(struct.pack("<i", len(entries)))
        for name, dt, arr in entries:
            out.write(name.encode().ljust(64, b"\x00"))
            out.write(struct.pack("<ii", dt, arr.ndim))
            for d in arr.shape:
                out.write(struct.pack("<q", d))
            out.write(arr.tobytes())


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
