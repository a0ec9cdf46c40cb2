"""CLI entry points, 1:1 with the reference scripts (SURVEY.md §1 L3):

- ``train_backbone``  <- train_efm.py (joint softmax + triplet LightCNN-29)
- ``train_head``      <- pre-trained_efm_v3.py (linear head over features)
- ``train_final``     <- final_efm.py (frozen backbone + 342-d head)
- ``extract_features``<- extract_feacture_v2.py
- ``eval_cos``        <- test_efm_v2.py (no-training cosine distributions)
- ``draw_cos``        <- draw_cos_dis_real.py
- ``slice_dataset``   <- feature_extraction/c_version/slice_celeb1m.py
- ``lfw_eval``        (new: generates the LFW baseline; SURVEY.md §6)
- ``lfw_run``         (new: one-command LFW tarball+pairs.txt -> align ->
                       embed -> 10-fold accuracy/VAL table; facenet.py:428-520)
- ``align``           <- feature_extraction/facenet_version/align_dataset_mtcnn.py
- ``pack_dataset``    <- the implied im2rec RecordIO packing step
- ``train_began``     (README-only BEGAN-CS + triplet capability)
- ``serve_demo``      <- the C++ runtime's live recognition loop (§3.4)
- ``identify``        <- Register_DB*/Compare_Face_DB flows (headless
                         enroll + batch identification on the native store)
                         + person-level subcommands (the PG Person schema)
- ``landmarks68``     <- MTCNN_Dlib_Detection (train/apply ERT shape
                         predictors; MTCNN.hpp:1326-1421)

Run as ``python -m improving_face_recognition_performance_using_triplet_loss_tpu.cli.<name>``,
or via the launcher: ``python fx.py <name> [args...]`` /
``python -m improving_face_recognition_performance_using_triplet_loss_tpu.cli <name>``.
"""
