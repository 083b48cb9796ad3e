from .mesh import make_mesh, shard_step, shard_train_step, replicate, shard_batch
