"""gpuseqalign_tpu — a TPU-native pairwise sequence-alignment framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
markods/GpuSeqAlign reference benchmark (single-binary C++17/CUDA):
Needleman-Wunsch and Smith-Waterman pairwise alignment with linear and
affine gap penalties, batched across chips and partitioned across hosts.

Layer map (mirrors reference layers, see SURVEY.md §1):
  io/        config & input parsing   (ref: cmd_parser/file_formats/io, L5)
  bench/     benchmark orchestrator   (ref: benchmark.cpp, L4)
  core/      registry, types, params  (ref: nw_algorithm/run_types, L3)
  models/    alignment problem specs + CPU oracles (ref: nwalign_cpu*, L2a)
  ops/       TPU compute kernels (XLA + Pallas)    (ref: nwalign_gpu*, L2a)
  trace/     traceback / hash / print (ref: nwtrace*, L2b)
  parallel/  batch + multi-chip/multi-host engines (new capability)
  utils/     stopwatch, memory tracking            (ref: L1)
  native/    C++ host runtime (oracle DP, traceback, hashing) via ctypes
"""

__version__ = "0.1.0"
