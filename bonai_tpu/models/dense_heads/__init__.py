from .rpn_head import RPNHead, rpn_targets, rpn_loss, rpn_proposals_single

__all__ = ["RPNHead", "rpn_targets", "rpn_loss", "rpn_proposals_single"]
