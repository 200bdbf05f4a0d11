from streammos_tpu.postprocess.voting import (instance_vote, voxel_vote,
                                              voxel_vote_device)

__all__ = ["voxel_vote", "voxel_vote_device", "instance_vote"]
