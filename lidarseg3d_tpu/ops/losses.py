"""Segmentation losses under static-shape padding.

Lovász-softmax semantics follow the reference
(/root/reference/det3d/core/utils/loss_utils.py:217-330): per-class sorted
errors dotted with the Lovász gradient, averaged over classes present in the
(valid) labels. Padding/ignored entries are excluded exactly: they carry zero
error and zero foreground, are sorted to the back, and contribute nothing to
any prefix that contains a valid element.
"""

import jax
import jax.numpy as jnp


def cross_entropy(logits, labels, ignore_index=0, valid=None):
    """Mean CE over valid entries, matching nn.CrossEntropyLoss(ignore_index).

    logits: [N, C]; labels: [N] int; valid: optional [N] bool extra mask.
    """
    ok = labels != ignore_index
    if valid is not None:
        ok = ok & valid
    labels_safe = jnp.clip(labels, 0, logits.shape[-1] - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels_safe[:, None], axis=-1)[:, 0]
    okf = ok.astype(logits.dtype)
    return jnp.sum(nll * okf) / jnp.maximum(jnp.sum(okf), 1.0)


def lovasz_softmax(probas, labels, ignore=None, valid=None, classes="present"):
    """Multi-class Lovász-softmax over flat predictions.

    probas: [N, C] softmax probabilities; labels: [N] int.
    ignore: label value excluded from the loss (and from fg counts).
    valid: optional [N] bool mask for padding rows.
    classes: 'present' averages over classes with fg>0 (reference default).
    """
    N, C = probas.shape
    ok = jnp.ones((N,), dtype=bool)
    if ignore is not None:
        ok = ok & (labels != ignore)
    if valid is not None:
        ok = ok & valid
    okf = ok.astype(probas.dtype)

    def class_loss(c):
        fg = ((labels == c) & ok).astype(probas.dtype)  # [N]
        errors = jnp.abs(fg - probas[:, c]) * okf
        # sort descending; invalid entries (errors==0 by construction) get a
        # -inf sort key so they land strictly at the back
        sort_key = jnp.where(ok, errors, -jnp.inf)
        order = jnp.argsort(-sort_key)
        errors_s = errors[order]
        fg_s = fg[order]
        gts = jnp.sum(fg_s)
        intersection = gts - jnp.cumsum(fg_s)
        union = gts + jnp.cumsum(1.0 - fg_s) - jnp.cumsum((1.0 - okf)[order])
        # jaccard of prefixes; guard 0/0 for empty prefixes
        jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
        grad = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
        loss_c = jnp.dot(errors_s, grad)
        present = gts > 0
        return loss_c, present

    losses, present = jax.vmap(class_loss)(jnp.arange(C))
    if classes == "present":
        pf = present.astype(probas.dtype)
        return jnp.sum(losses * pf) / jnp.maximum(jnp.sum(pf), 1.0)
    return jnp.mean(losses)
