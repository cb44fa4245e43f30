"""Hot-path TPU kernels (Pallas).

The reference's per-ray C++ hot loops (BVH traversal bvh.cpp:223+, shape
intersections) map here to fused Pallas kernels: scene data stays resident
in VMEM/SMEM, rays stream through in blocks, and no (R, P) intermediate
ever touches HBM.
"""
