"""The base OpenVision training config.

Capability parity with reference src/configs/openvision.py:26-365: same
tunables (res, batch_factor, base_lr, img/txt variants, token lengths,
parallelism counts, mask_ratio, ...), same pp-string pipeline, same
optimizer/schedule/loss constants (Adam b2=0.95 mu=bf16, wd 0.2 on kernels,
cosine with IN-1K-equivalent warmup epochs, coca loss 1·CLIP + 2·caption).
"""

from __future__ import annotations

from ml_collections import ConfigDict

from openvision_tpu.configs.common import parse_arg

IMAGENET_SAMPLES = 1_281_167


def get_config(arg: str | None = None) -> ConfigDict:
    arg = parse_arg(
        arg,
        res=112,
        batch_factor=2.0,
        base_lr=8e-6,
        imagenet_epoch=2000,
        vitual_warmup_epoch=20,
        runlocal=False,
        token_len=80,
        output_token_len=128,
        remat="full",
        img="L/16",
        txt_name="L/16",
        data_parallelism=-1,
        fsdp_parallelism=1,
        tensor_parallelism=1,
        seq_parallelism=1,
        pipe_parallelism=1,
        img_head=True,
        use_sovit=False,
        mask_ratio=0.0,
        txt_key1="txt",
        txt_key2="llava_caption",
        color_jitter=True,
        vocab_path="assets/bert_base_vocab_bos_eos.txt",
        txt_decoder_name="L",
        vocab_size=32000,
        # "auto" resolves per tower below: the image tower takes "fused"
        # (Pallas fwd+bwd block kernels) for long sequences (res >= 336 →
        # 577+ tokens, +19% train step vs xla — docs/PERF_NOTES.md
        # "Long-sequence training ladder") and "xla" otherwise (a wash at
        # 224); text towers (<=80 tokens) always resolve "xla". Explicit
        # picks: "fused_t" = transposed-stream flagship (serving, 997
        # img/s encode), "ring" = seq-parallel, "xla"/"scan"/"flash" as
        # in ops/.
        attn_impl="auto",
        # caption-decoder attention over the concat [image+text|queries]
        # sequence (465 tokens at 224px). "auto" resolves below.
        dec_attn_impl="auto",
        # caption-decoder fusion style: "concat" (one self-attn stack over
        # [image+text | queries], the reference's default) or "cross_attn"
        # (depth//2 pairs of causal self-attn over the 128 queries +
        # cross-attn to the prefix — never builds the 465-token concat
        # sequence; reference src/models/text_decoder.py:521-555).
        # MEASURED (docs/PERF_NOTES.md round 4): cross_attn trains
        # +14-18% faster (193.0 vs 168.5 img/s/chip at L/14@224 bs32,
        # 202.4 vs 177.8 at bs64, 89.0 vs 75.4 at 336px) with identical
        # train_demo quality (both 100% zero-shot, caption loss -> 0).
        # The default stays "concat" ONLY because fusion style changes the
        # checkpoint layout (crossattn_encoderblock_i trees) and released
        # reference models use concat — prefer cross_attn for new runs.
        dec_fusion="concat",
        # chunk size for the head-fused caption cross-entropy (0 = build
        # full logits and use plain softmax_xent)
        cap_xent_chunk=16,
        dtype="float32",
        param_dtype="float32",
    )

    c = ConfigDict()

    # ----- sharding -----
    c.sharding = ConfigDict()
    c.sharding.mesh = dict(
        data=arg.data_parallelism,
        fsdp=arg.fsdp_parallelism,
        tensor=arg.tensor_parallelism,
        # ring-attention sequence sharding (beyond reference): seq>1 with
        # attn_impl="ring" shards token dims over the `seq` mesh axis
        seq=arg.seq_parallelism,
        # GPipe pipeline stages (beyond reference; ops/pipeline_parallel.py)
        pipe=arg.pipe_parallelism,
    )

    # ----- checkpoints / logging -----
    c.save_ckpt = True
    c.keep_ckpt = 100_000_000
    c.ckpt_steps = 1000
    c.log_training_steps = 50
    c.wandb = dict(log_wandb=False)

    # ----- input -----
    c.input = ConfigDict()
    c.input.data = dict(name="synthetic", split="train", data_dir="")
    c.input.shuffle_buffer_size = 250_000 if not arg.runlocal else 50
    c.input.txt_token_length = arg.token_len
    c.input.batch_size = int(1024 * 16 * arg.batch_factor)
    # batch-level mixup/cutmix after grain.Batch (reference cpu_mixup /
    # mixup.py:29). Off by default; supervised recipes flip `enabled`.
    c.input.mixup = dict(
        enabled=False, mixup_alpha=0.8, cutmix_alpha=1.0, switch_prob=0.5,
        image_key="image", label_key="labels",
    )
    c.init_shapes = [(128, arg.res, arg.res, 3), (256, arg.token_len)]
    c.init_types = ["float32", "int32"]

    tokenizer = (
        f'my_bert_tokenize(max_len={arg.token_len}, '
        f'output_token_len={arg.output_token_len}, '
        f'vocab_path="{arg.vocab_path}", add_bos=True, add_eos=True, '
        f'key1="{arg.txt_key1}", key2="{arg.txt_key2}")'
    )
    text_pp = (
        f"|flatten|{tokenizer}|get_autoreg_label(pad_token=0)"
        '|keep("image", "labels1", "labels2", "autoreg_labels", "cap_loss_mask")'
    )
    img_pp = (
        f'inception_crop(inkey="jpg", size={arg.res}, area_min=40, '
        'method="bilinear", antialias=True)'
    )
    if arg.color_jitter:
        img_pp += "|simclr_jitter_gray(jitter_strength=0.4)"
    c.input.pp = img_pp + text_pp
    c.pp_modules = ["ops_general", "ops_image", "ops_text", "bert_ops"]

    # ----- model -----
    # "auto" attention: fused Pallas blocks for the image tower. Measured
    # L/14 ladders (docs/PERF_NOTES.md "Training-step ladder, round 3"):
    # +19% over xla at 336px/577 tok; at 224 fused wins outright with
    # remat=none (159.7 vs 150.1 bs32) and under remat=minimal ties at bs32
    # (152.9 vs 153.8) but wins +22% at bs64 (162.2 vs 132.8 — XLA's fused
    # backward spills as the batch grows, the Pallas kernels don't), so
    # fused is the uniform pick. The text tower is short-sequence → xla;
    # the caption decoder resolves separately below (dec_attn_impl).
    img_attn = arg.attn_impl
    txt_attn = arg.attn_impl
    if arg.attn_impl == "auto":
        img_attn = "fused"
        txt_attn = "xla"
        if arg.pipe_parallelism > 1:
            # pipeline parallelism rotates activations through a shard_map
            # ppermute ring; the fused Pallas paths open their own shard_map
            # and are not pipe-eligible (encoder.py:_pipe_eligible), so with
            # pipe stages requested "auto" must pick an eligible impl or the
            # pipe mesh axis would silently go unused.
            img_attn = txt_attn = "xla"
    dec_attn = arg.dec_attn_impl
    if dec_attn == "auto":
        # measured on the decoder's 465-token concat sequence (L/14@224 CoCa,
        # remat=none, 1 chip, bs32): the whole-sub-block fused kernel with
        # its native prefix-LM mask beats flash beats unfused xla —
        # 168.1 > 159.7 > 159.0 img/s (docs/PERF_NOTES.md round-3 decoder
        # ladder; fused never round-trips q/k/v through HBM and never saves
        # the 12 per-block (B, H, 465, 465) probability tensors for the
        # backward) — but a pallas_call cannot ride the pipe shard_map ring.
        dec_attn = "xla" if arg.pipe_parallelism > 1 else "fused"

    c.model_name = "clip"
    c.model = ConfigDict()
    c.model.image = ConfigDict(
        dict(
            variant=arg.img,
            posemb="sincos2d",
            pool_type="gap",
            remat_policy=arg.remat,
            mask_ratio=arg.mask_ratio,
            attn_impl=img_attn,
            # tanh GELU deviates ≤5e-6 output cosine from exact; free speed
            # under bf16 compute (see docs/PERF_NOTES.md).
            fast_gelu=arg.dtype == "bfloat16",
            emb_head_bias=False,
            head_zeroinit=False,
            dtype=arg.dtype,
            param_dtype=arg.param_dtype,
            output_tokens=True,
        )
    )
    c.model.text = ConfigDict(
        dict(
            variant=arg.txt_name,
            pool_type="last",
            causal=False,
            remat_policy=arg.remat,
            attn_impl=txt_attn,
            head_zeroinit=False,
            dtype=arg.dtype,
            param_dtype=arg.param_dtype,
            vocab_size=arg.vocab_size,
            embed_cls=True,
            output_tokens=True,
        )
    )
    c.model.text_decoder = "text_decoder"
    c.model.text_decoder_config = ConfigDict(
        dict(
            variant=arg.txt_decoder_name,
            num_classes=arg.vocab_size,
            dtype=arg.dtype,
            param_dtype=arg.param_dtype,
            # follow the global remat pick: with "none" the decoder's
            # (B, H, 465, 465) concat-fusion attention scores are saved
            # for backward — 12 x 232 MB at bs64, the memory ceiling once
            # the caption logits are head-fused
            remat_policy=arg.remat,
            fusion_style=arg.dec_fusion,
            causal=True,
            attn_impl=dec_attn,
            num_learnable_tokens=arg.output_token_len,
            drop_token=0,
            # head-fused caption loss: the (B, L, 32k) f32 logits tensor —
            # the train step's single largest allocation — is never
            # materialized; losses.linear_softmax_xent scans the head
            # matmul over cap_xent_chunk-token chunks (numerics identical,
            # tests/test_train_step.py).
            return_prelogits=arg.cap_xent_chunk > 0,
        )
    )
    c.cap_xent_chunk = arg.cap_xent_chunk
    c.model.temperature_init = 1 / 0.07

    if arg.use_sovit:
        dim = 1152
    else:
        dim = {
            "m": 32, "T": 192, "S": 384, "B": 512, "L": 768, "H": 1024, "g": 1024,
        }[arg.img[0]]
    c.model.out_dim = (dim if arg.img_head else None, dim)

    # ----- optimizer / schedule -----
    batch_size = c.input.batch_size
    total_samples = IMAGENET_SAMPLES * arg.imagenet_epoch
    warmup_samples = IMAGENET_SAMPLES * arg.vitual_warmup_epoch
    c.total_steps = int(total_samples // batch_size) if not arg.runlocal else 1
    c.optax_name = "scale_by_adam"
    c.optax = dict(mu_dtype="bfloat16", b1=0.9, b2=0.95)
    c.lr = arg.base_lr * 64 * arg.batch_factor
    c.wd = 0.2
    c.schedule = [
        (
            ".*",
            dict(
                decay_type="cosine",
                warmup_steps=int(warmup_samples // batch_size),
                min_lr=0,
                max_lr=arg.base_lr * 64 * arg.batch_factor,
            ),
        )
    ]

    # ----- loss -----
    c.loss_type = "coca"
    c.coca_caption_loss_weight = 2.0
    c.clip_loss_weight = 1.0
    c.local_loss = True
    c.cpu_unit8 = True
    # grad_accum > 1 microbatches the step (exact to the big-batch step via
    # embedding-gradient caching — train/step.py:_make_update_fn_accum).
    # Lets the 32k pretrain recipe run on meshes far smaller than the
    # reference's 128-way DP floor (train.sh:18-29); measured +10.6% step
    # time at accum=4 (docs/PERF_NOTES.md).
    c.grad_accum = 1

    # ----- evals -----
    c.eval_only = False
    c.evals = ConfigDict()
    sub = "[:4]" if arg.runlocal else ""
    eval_tok = (
        f'my_eval_bert_tokenize(inkey="texts", max_len={arg.token_len}, '
        f'vocab_path="{arg.vocab_path}", add_bos=True, add_eos=True)'
    )
    # normalization (vgg mean/std) runs ON DEVICE via device_norm so eval
    # batches ship uint8 — 4x less host→device transfer, 2.5x measured
    # end-to-end disclf speedup (docs/PERF_NOTES.md "Zero-shot eval at
    # scale"). pp therefore stops after the crop.
    eval_img_pp = (
        f'|resize_small({arg.res}, method="bilinear", antialias=True)'
        f"|central_crop({arg.res})"
    )
    c.evals.disclf = ConfigDict(
        dict(
            type="discriminative_classifier",
            dataset_names=["imagenet2012"],
            split=f"validation{sub}",
            data_dir="",
            pp_img=eval_img_pp,
            pp_txt=eval_tok,
            device_norm="vgg",
            canonicalize=True,
            first_class_name_only=False,
            prefix="z/0shot/",
            log_steps=int(2000 // arg.batch_factor),
        )
    )
    c.evals.retrieval = ConfigDict(
        dict(
            type="retrieval",
            dataset="coco_captions",
            split="val",
            data_dir="",
            txt_name=("captions", "text"),
            pp_img=eval_img_pp,
            pp_txt=eval_tok,
            device_norm="vgg",
            log_steps=int(2000 // arg.batch_factor),
        )
    )

    c.seed = 0
    return c
