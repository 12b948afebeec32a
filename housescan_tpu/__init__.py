"""housescan-tpu: TPU-native building-scale interior 3D reconstruction.

A brand-new JAX/XLA/Pallas framework with the capabilities of nh2/housescan
(reference: /root/reference/housescan): KinectFusion-style RGB-D scanning
(TSDF integration, raycasting, projective point-to-plane ICP, marching cubes)
as TPU kernels, RANSAC wall-plane detection, room corner suggestion, oriented
cuboid fitting, cross-room wall connection, and least-squares room-grid
alignment, ending in full-resolution aligned .ply/.pcd export.

Layer map (bottom-up; see SURVEY.md for the reference analysis):

    utils/      bijection, top-k selection, connected components, ids, metrics
    geometry/   plane algebra, rigid transforms, plane fitting (ref Main.hs:1354-1735)
    solvers/    translation least-squares, Nelder-Mead, cuboid fitting
                (ref TranslationOptimizer.hs, FitCuboidBFGS.hs)
    io/         PCD/PLY/planes.txt/.xf formats, versioned checkpoints
                (ref Main.hs:1320-1410, 1919-1975, 2676-2721)
    rooms/      the domain pipeline: load, corners, cuboids, walls, global
                position optimization, export (ref Main.hs:1458-2330)
    ops/        Pallas TPU kernels (TSDF, raycast, bilateral, marching cubes)
    kinfu/      the KinectFusion pipeline the reference delegated to its
                external C++/CUDA PCL fork (ref README.md:14-17)
    parallel/   device-mesh sharding: Z-sharded TSDF volumes, room-batch DP
    capture/    depth-stream replay/record (ref HoniHelper.hs)
    viewer/     headless scene queries + offscreen rendering (ref Main.hs:371-1056)
    cli/        subcommands replacing the GLUT key bindings (ref Main.hs:950-1008)
    devloop/    state-preserving dev reload (ref Main.hs:1176-1260)

Conventions (documented once, used everywhere — the reference's mixed
row/column conventions were a recorded pain point, ref TODO.md:4-5):

  * Points are ROW vectors; transforms right-multiply: ``p' = p @ M``.
    A rigid transform is a 4x4 matrix with the translation in the LAST ROW,
    i.e. ``[[R 0],[t 1]]`` (matching the reference's Proj4, Main.hs:1725-1730).
    Exports transpose to the common left-multiplicative form
    (ref Main.hs:2279-2284).
  * Planes are in Hessian normal form ``n . x = d`` with unit ``n``
    (ref Main.hs:1354-1358). PCL's ``ax+by+cz+d=0`` is converted by negating
    d on import (ref Main.hs:1383-1385).
  * Quaternions are ``(x, y, z, w)`` and normalized before use.
  * Device arrays are float32; host-side solvers may use float64.
"""

__version__ = "0.1.0"

from housescan_tpu import geometry, solvers, utils  # noqa: F401
