#!/bin/bash
# Sequential per-stage profiling sweep on the real TPU -> PROFILE_SWEEP.jsonl
# Every case pins NRC_WAVEFRONT_QUEUE explicitly so the banded-vs-queued
# attribution is unambiguous.
cd /root/repo
OUT=${1:-PROFILE_SWEEP.jsonl}
: > "$OUT"
run() {
  echo "=== $* ===" >&2
  timeout 2400 python tools/profile_frame.py "$@" >> "$OUT" 2>>profile_sweep.err
}
# 1. demo 720p, banded layout: baseline + bounce histogram
NRC_WAVEFRONT_QUEUE=0 run --case demo --res 1280x720 --spp 3 --hist --label demo720_banded
# 1b. demo 720p, the round-4 production default (compact-once)
NRC_WAVEFRONT_QUEUE=once run --case demo --res 1280x720 --spp 3 --label demo720_once
# 2. demo 720p, per-depth compacted queue (round-3 candidate, rejected)
NRC_WAVEFRONT_QUEUE=1 run --case demo --res 1280x720 --spp 3 --label demo720_queued
# 3. queued, training stages truncated (wavefront-only cost)
NRC_WAVEFRONT_QUEUE=1 NRC_PROFILE_SKIP=all run --case demo --res 1280x720 --spp 3 --label demo720_queued_wavefront_only
# 4. queued, leaf tests stubbed (descend-only cost; results wrong, timing only)
NRC_WAVEFRONT_QUEUE=1 NRC_WIDE_SKIP_LEAF=1 NRC_PROFILE_SKIP=all run --case demo --res 1280x720 --spp 3 --label demo720_queued_descend_only
# 5. per-config budget rows (banded = the shipped round-2 numbers' layout)
NRC_WAVEFRONT_QUEUE=0 run --case cornell --spp 16 --tile 4 --label cornell320_banded
NRC_WAVEFRONT_QUEUE=1 run --case cornell --spp 16 --tile 4 --label cornell320_queued
NRC_WAVEFRONT_QUEUE=0 run --case vmaterials --res 96x96 --spp 8 --tile 2 --label vmat96_banded
NRC_WAVEFRONT_QUEUE=1 run --case vmaterials --res 96x96 --spp 8 --tile 2 --label vmat96_queued
NRC_WAVEFRONT_QUEUE=once run --case demo --res 1280x360 --spp 4 --label demoship_once
cat "$OUT"
