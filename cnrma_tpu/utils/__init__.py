from cnrma_tpu.utils.ply import write_ply_mesh, write_ply_points, read_ply
