#!/bin/bash
# Build the C reference (CPU path, cuda/netcdf stubbed) and stage LF-converted
# copies of the shipped data plus the parity case configs.
set -e
cd "$(dirname "$0")"

make -s

mkdir -p data cases out

for f in /root/reference/data/2D/box_pipe/box_pipe_data.txt \
         /root/reference/data/2D/heart_US/heart_US_data.txt \
         /root/reference/data/3D/example_tests/box_pipe/box_pipe_2D_data.txt \
         /root/reference/data/3D/example_tests/tetra/tetra_data.txt \
         /root/reference/data/3D/example_tests/non_uniform_pipe/non_uniform_pipe_2D_data.txt; do
  tr -d '\r' < "$f" > "data/$(basename "$f")"
done
cp /root/reference/data/3D/example_tests/white_sea/white_sea_data.nc data/
python ../scripts/convert_nc.py data/white_sea_data.nc data/white_sea_data.nc.rawnc

# 2D box_pipe with the ADI scheme (shipped config uses Stable)
sed 's/solver\t\tStable/solver\t\tADI/' /root/reference/data/2D/box_pipe/box_pipe_config.txt \
  | tr -d '\r' > cases/box_pipe_adi.txt
# Stable (projection) solver variant of the same case
sed 's/solver\t\tADI/solver\t\tStable/' cases/box_pipe_adi.txt > cases/box_pipe_stable.txt
# 25-step Stable variant (the sequential GS makes the full 50-step run slow)
{ cat cases/box_pipe_stable.txt; printf '\ntime_steps\t25\nout_time_steps\t5\n'; } \
  > cases/box_pipe_stable25.txt

# 3D extruded box_pipe, shortened to 10 steps, per-step output
sed -e 's/time_steps\t100/time_steps\t10/' \
    /root/reference/data/3D/example_tests/box_pipe/box_pipe_2D_config.txt \
  | tr -d '\r' > cases/box_pipe_3d.txt
sed 's/out_time_steps \t10/out_time_steps \t1/' cases/box_pipe_3d.txt > cases/box_pipe_3d_out1.txt
# 1000-step fidelity-gate case: 100 cycles x 10 steps, one record per 100
sed -e 's/cycles \t\t1/cycles \t\t100/' -e 's/out_time_steps \t10/out_time_steps \t100/' \
    cases/box_pipe_3d.txt > cases/box_pipe_3d_long.txt

# tetra: shipped config lacks out_vars and frame_time (the reference would
# refuse / run zero steps) — add them
{ tr -d '\r' < /root/reference/data/3D/example_tests/tetra/tetra_config.txt;
  printf '\nout_vars\t4 u v w T\nframe_time\t1.0\n'; } > cases/tetra.txt

# white_sea shortened to 10 steps
sed -e 's/time_steps \t100/time_steps \t10/' \
    /root/reference/data/3D/example_tests/white_sea/white_sea_config.txt \
  | tr -d '\r' > cases/white_sea.txt

# full-size white_sea (large_tests: 2x finer grid, 150x100x100 out), cut
# from 5000 steps to 4
sed -e 's/time_steps \t5000/time_steps \t4/' -e 's/out_time_steps \t250/out_time_steps \t1/' \
    /root/reference/data/3D/large_tests/white_sea/white_sea_config.txt \
  | tr -d '\r' > cases/white_sea_large.txt

# heart_us animated 3D mesh (large_tests): the shipped config lacks
# out_vars (the reference exits without it) and frame_time (Shape3D cycle
# length = frame_time, Grid3D.cpp:303-309 — unset means zero steps), and
# uses the unrecognized calc_subframes key (-> default time_steps 50);
# pin an explicit 46-step cycle with per-2-step records
tr -d '\r' < /root/reference/data/3D/large_tests/heart_us/heart_us_3D_data.txt > data/heart_us_3D_data.txt
{ tr -d '\r' < /root/reference/data/3D/large_tests/heart_us/heart_us_3D_config.txt;
  printf '\nout_vars\t4 u v w T\nframe_time\t1.0\ntime_steps\t1\nout_time_steps\t2\n'; } \
  > cases/heart_us_3d.txt

# non_uniform_pipe: shipped only as 2D data + config for the extruded run
sed -e 's/time_steps\t100/time_steps\t10/' \
    /root/reference/data/3D/example_tests/non_uniform_pipe/non_uniform_pipe_2D_config.txt \
  | tr -d '\r' > cases/non_uniform_pipe.txt

echo "refbuild ready"
