from pyipm_tpu.parallel.batch import solve_batch, make_batch_solver
