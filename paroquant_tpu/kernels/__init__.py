from .rot_matmul import butterfly_w4_matmul, rot_w4_matmul, w4_matmul
