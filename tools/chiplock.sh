# Chip-claim mutex: source this and run EVERY chip-touching command via
# `with_chip <cmd...>`.
#
# Why (measured 2026-08-17): the attach relay has no claim queue — a process
# that tries to claim the chip while another process's attach or teardown is
# in flight futex-waits FOREVER (it is never woken on release), and killing
# an attached process wedges the relay for 20-30 min.  Serializing every
# claim through one flock, with a post-exit teardown gap, removes the race
# class entirely.
#
# Usage:
#   source /root/repo/tools/chiplock.sh
#   with_chip timeout 3600 python -m ml_super_resolution_tpu.cli train ...
#   with_chip timeout 120 python -c 'import jax; ...'   # health poll

SR_CHIP_LOCK=${SR_CHIP_LOCK:-/tmp/sr_chip.lock}
SR_CHIP_GAP=${SR_CHIP_GAP:-45}   # seconds of teardown spacing after exit

with_chip() {
  (
    flock -w 10800 9 || { echo "with_chip: lock timeout" >&2; exit 97; }
    "$@"
    rc=$?
    # let the claim fully release before the next holder attaches
    sleep "$SR_CHIP_GAP"
    exit $rc
  ) 9>"$SR_CHIP_LOCK"
}
