# SDSeg3D on nuScenes-lidarseg with test-time augmentation: the eval
# pipeline emits 1 identical + 5 augmented variants per frame
# (SegCompoundAug), whose softmax outputs are arithmetic-mean merged in
# apis/eval.py. Mirrors the reference
# configs/semanticnusc/SDSeg3D/semnusc_transvfe_unetscn3d_batchloss_e48_tta.py.

from configs.semanticnusc.SDSeg3D.semnusc_transvfe_unetscn3d_batchloss_e48 import *  # noqa

TTA_FLAG = True
# 1 identical point cloud + 5 variants; decrease samples_per_gpu for larger
# NUM_TTA_TRANSFORMS to stay in HBM
NUM_TTA_TRANSFORMS = 1 + 5

test_cfg = dict(
    tta_flag=TTA_FLAG,
    merge_type="ArithmeticMean",
    num_tta_tranforms=NUM_TTA_TRANSFORMS,
)
tta_cfg = dict(
    global_rotation_noise=train_preprocessor["global_rot_noise"],  # noqa: F405
    global_scaling_noise=train_preprocessor["global_scale_noise"],  # noqa: F405
    global_translate_std=train_preprocessor["global_translate_std"],  # noqa: F405
    global_flip_prob=0.5,
    num_tta_tranforms=NUM_TTA_TRANSFORMS,
)
