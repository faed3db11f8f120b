#!/bin/bash
# Mirror of the reference's examples/run.sh (reference: examples/run.sh:1-5)
# against the reference's own example data. Run from this directory after
# linking or copying the data:
#   ln -s /root/reference/examples/data data
#   cp /root/reference/examples/fof.txt .
set -e

kmdiff-tpu count --file fof.txt --run-dir kc_dir --kmer-size 31 --hard-min 2

kmdiff-tpu diff --km-run-dir kc_dir -1 10 -2 10 --output-dir out -s 0.01

head -4 out/control_kmers.fasta out/case_kmers.fasta
