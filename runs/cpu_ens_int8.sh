#!/bin/bash
set -u
cd /root/repo
E="env JAX_PLATFORMS=cpu PYTHONPATH=/root/repo"
ev () {
  local wd=$1 tag=$2; shift 2
  $E timeout 5400 python -m ml_super_resolution_tpu.cli eval \
    --workdir "$wd" --best --int8 --ensemble "$@" \
    > "runs/${tag}.json" 2> "runs/${tag}.err"
  echo "== $tag: $(tail -c 300 runs/${tag}.json)"
}
ev runs/r3_srcnn_x2    cpu_i8ens_srcnn
ev runs/r3_vdsr_ms     cpu_i8ens_vdsr --scales 2,3,4
ev runs/r3_edsr_x4     cpu_i8ens_edsr
ev runs/r3_srgan_x4    cpu_i8ens_srgan
echo "I8ENS DONE ($(date -u +%H:%M))"
