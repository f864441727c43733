#!/bin/bash
# Each TPU step runs under retry: a wedged attempt (dead tunnel slot)
# is killed at its timeout and retried — the retry lands on the live
# slot (observed alternation).
retry() {
  local T=$1; shift
  for i in 1 2 3 4; do
    timeout "$T" "$@" && return 0
    echo "== RETRY $i of: $* =="
    sleep 20
  done
  echo "== GIVING UP: $* =="
  return 1
}
set -x
cd /root/repo
retry 700 python -u bench.py
cd demo
export JRL_DEMO_OUT=/tmp/verify_out
rm -rf /tmp/verify_out; mkdir -p /tmp/verify_out
retry 600 python -u demo_2d_LBM.py --res 64 64 --total_steps 100
retry 900 python -u demo_2d_LBM_cylinder.py --res 800 400 --total_steps 2000
retry 900 python -u demo_2d_LBM_JRL_fluid_45degree.py --res 48 32 --Re 4.0 --vel_obs_real 0.2848 --gravity_strength_real 0
retry 900 python -u demo_2d_LBM_JRL_C_45degree.py --res 48 32 --Re 4.0 --Pe 5.0 --vel_obs_real 0.2848 --gravity_strength_real 0 --balance_time 0.3
cd /root/repo
XLA_FLAGS=--xla_force_host_platform_device_count=8 retry 600 python -c "
import jax; jax.config.update('jax_platforms','cpu')
import __graft_entry__ as g; g.dryrun_multichip(8); print('multichip ok')"
echo VERIFY_DONE
