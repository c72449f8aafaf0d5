#!/bin/bash
# Post-diffusion-training TPU session: MDN train -> bench -> train-speed -> eval.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

# 1) MDN scorer training
python -m diffbindfr_tpu.app.train_cli -i runs/train_complexes.csv \
  --val-csv runs/val_complexes.csv -o runs/mdn_r2 --model mdn \
  --steps 2000 -bs 8 --lr 3e-4 --ckpt-every 500 --val-every 250 \
  --log-every 50 > runs/mdn_r2.log 2>&1

# 2) bench: fused layer vs 3-kernel vs XLA
BENCH_FUSED=1 python bench.py > runs/bench_fused.json 2> runs/bench_fused.log
BENCH_FUSED=0 python bench.py > runs/bench_3k.json 2> runs/bench_3k.log
BENCH_PALLAS=0 python bench.py > runs/bench_xla.json 2> runs/bench_xla.log

# 3) training step rate: custom-VJP fused path vs XLA path (300 steps each)
python -m diffbindfr_tpu.app.train_cli -i runs/train_complexes.csv \
  -o /tmp/tspeed_pallas --steps 300 -bs 8 --log-every 50 --ckpt-every 10000 \
  --pallas > runs/tspeed_pallas.log 2>&1
python -m diffbindfr_tpu.app.train_cli -i runs/train_complexes.csv \
  -o /tmp/tspeed_xla --steps 300 -bs 8 --log-every 50 --ckpt-every 10000 \
  > runs/tspeed_xla.log 2>&1

# 4) eval protocol on all 5 complexes (4 train + held-out 2zec)
python -m diffbindfr_tpu.app.eval_cli --lib pb -d runs/pb_bench -o runs/eval_r2 \
  -ckt "$1" -mdn runs/mdn_r2/mdn_ckpt_0002000.npz \
  -np 40 -bs 8 -sd 0 > runs/eval_r2.log 2>&1

# 5) eval with fresh DG-embedded conformers (reference-faithful: no crystal
#    geometry reuse)
python -m diffbindfr_tpu.app.eval_cli --lib pb -d runs/pb_bench -o runs/eval_r2_nc \
  -ckt "$1" -mdn runs/mdn_r2/mdn_ckpt_0002000.npz \
  -np 40 -bs 8 -sd 0 -nc 8 > runs/eval_r2_nc.log 2>&1
