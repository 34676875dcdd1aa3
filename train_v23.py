#!/usr/bin/env python
"""Train V2 (private passport) or V3 (V2 + trigger-set backdoor) models.

Same flags as train_v1.py but --train-private defaults to True
(reference train_v23.py:42-43).
"""

from pprint import pprint

from train_v1 import build_parser, maybe_init_multihost


def main():
    p = build_parser()
    p.set_defaults(train_private=True)
    args = vars(p.parse_args())
    pprint(args)
    maybe_init_multihost(args)

    from deepipr_tpu.train.experiment import ClassificationExperiment

    exp = ClassificationExperiment(args)
    if args["eval"]:
        print(exp.evaluate_only())
    elif exp.is_tl:
        from deepipr_tpu.train.transfer import transfer_learning

        transfer_learning(exp)
    else:
        exp.training()
    print("Training done at", exp.logdir)


if __name__ == "__main__":
    main()
