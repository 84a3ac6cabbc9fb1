#!/bin/bash
# Run every shipped example case end-to-end (the analogue of the reference's
# bin/Release/run_examples_{CPU,GPU}.sh).  Requires refbuild/prepare.sh for
# the LF-converted data staging.
set -e
cd "$(dirname "$0")/.."
OUT=out/examples
mkdir -p $OUT

echo "== 2D box_pipe (Stable, shipped config)"
python -m cmcfs_tpu.cli2d refbuild/data/box_pipe_data.txt $OUT/box_pipe_2d.nc \
    /root/reference/data/2D/box_pipe/box_pipe_config.txt quiet

echo "== 3D box_pipe (extruded 2D, ADI)"
python -m cmcfs_tpu.cli3d refbuild/data/box_pipe_2D_data.txt $OUT/box_pipe_3d \
    refbuild/cases/box_pipe_3d.txt quiet

echo "== 3D tetra (Shape3D, ADI)"
python -m cmcfs_tpu.cli3d refbuild/data/tetra_data.txt $OUT/tetra \
    refbuild/cases/tetra.txt quiet

echo "== 3D white_sea (SeaNetCDF, ADI)"
python -m cmcfs_tpu.cli3d refbuild/data/white_sea_data.nc $OUT/white_sea \
    refbuild/cases/white_sea.txt quiet

echo "== 3D non_uniform_pipe (extruded 2D, ADI)"
python -m cmcfs_tpu.cli3d refbuild/data/non_uniform_pipe_2D_data.txt $OUT/nupipe \
    refbuild/cases/non_uniform_pipe.txt quiet

echo "all examples done -> $OUT"
