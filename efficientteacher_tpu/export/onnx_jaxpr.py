"""Direct ONNX export by translating a jaxpr — no onnx/tf2onnx/torch deps.

The reference exports deploy graphs with torch.onnx.export (reference
deploy/model_convert.py:75-130, export.py:78-94). The TPU-native
equivalent works at the jaxpr level: `jax.make_jaxpr` of the inference
function yields a flat primitive program (convs, elementwise, reshape,
concat, pooling) that maps 1:1 onto ONNX ops, independent of which model
family produced it — one translator covers the whole zoo instead of one
tracer per torch module tree.

Design:
- Model parameters are closed over, so they arrive as jaxpr constants;
  any eqn whose inputs are all constants is partially evaluated on host,
  which collapses BN statistics, decode grids and anchor tables into
  plain initializers.
- jax models here are NHWC; ONNX Conv/MaxPool are NCHW. Each symbolic
  value lazily caches permuted variants: convs produce NCHW variants,
  elementwise/concat ops chain in whatever shared variant their inputs
  already have, and a transpose back to the logical layout is emitted
  only when a layout-sensitive consumer (reshape/slice) or a graph
  output actually needs it. Whole conv trunks therefore stay NCHW with
  zero interior transposes.
- A post-pass folds per-channel Mul/Add/Sub chains (inference-mode BN)
  into the preceding Conv's weights/bias, producing the same fused
  Conv+bias graphs torch exporters emit.

Verified end-to-end in tests/test_onnx_export.py by running the emitted
file under cv2.dnn.readNetFromONNX and comparing with the jax forward.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from . import onnx_proto as P

_IDENT: Tuple[int, ...] = ()  # marker perm for the logical (jax) layout


def _inv(perm: Sequence[int]) -> Tuple[int, ...]:
    out = [0] * len(perm)
    for i, p in enumerate(perm):
        out[p] = i
    return tuple(out)


class _Sym:
    """A symbolic tensor: logical shape/dtype + per-permutation ONNX names."""

    __slots__ = ("shape", "dtype", "variants")

    def __init__(self, shape, dtype):
        self.shape = tuple(int(d) for d in shape)
        self.dtype = np.dtype(dtype)
        self.variants: Dict[Tuple[int, ...], str] = {}


class _Builder:
    def __init__(self):
        self.nodes: List[dict] = []
        self.inits: Dict[str, np.ndarray] = {}
        self._n = 0

    def fresh(self, hint: str = "t") -> str:
        self._n += 1
        return f"{hint}_{self._n}"

    def emit(self, op: str, inputs: Sequence[str], n_out: int = 1,
             attrs: Optional[dict] = None, hint: Optional[str] = None):
        outs = [self.fresh(hint or op.lower()) for _ in range(n_out)]
        self.nodes.append({"op": op, "inputs": list(inputs),
                           "outputs": outs, "attrs": attrs or {}})
        return outs[0] if n_out == 1 else outs

    def const(self, arr: np.ndarray, hint: str = "c") -> str:
        name = self.fresh(hint)
        self.inits[name] = np.ascontiguousarray(arr)
        return name


class _Translator:
    def __init__(self, builder: _Builder):
        self.b = builder
        self.env: Dict = {}  # jax Var -> np.ndarray | _Sym

    # ----------------------------------------------------------- value access
    def val(self, atom):
        if isinstance(atom, jax.extend.core.Literal):
            return np.asarray(atom.val)
        return self.env[atom]

    def name_of(self, v, perm: Tuple[int, ...] = _IDENT) -> str:
        """ONNX name of value v in layout `perm` (emits Transpose/const)."""
        if isinstance(v, np.ndarray):
            arr = v if perm is _IDENT or not perm else np.transpose(v, perm)
            return self.b.const(arr)
        assert isinstance(v, _Sym)
        if perm in v.variants:
            return v.variants[perm]
        # materialize from any existing variant
        src_perm, src_name = next(iter(v.variants.items()))
        if perm is _IDENT or not perm:
            rel = _inv(src_perm)
        elif src_perm is _IDENT or not src_perm:
            rel = tuple(perm)
        else:
            rel = tuple(_inv(src_perm)[p] for p in perm)
        name = self.b.emit("Transpose", [src_name], attrs={"perm": list(rel)})
        v.variants[perm] = name
        return name

    def bind_out(self, outvars, results):
        for ov, r in zip(outvars, results):
            if type(ov).__name__ == "DropVar":
                continue
            self.env[ov] = r

    # ------------------------------------------------------------ translation
    def run(self, jaxpr, consts, n_inputs_named):
        for cv, cval in zip(jaxpr.constvars, consts):
            self.env[cv] = np.asarray(cval)
        # invars pre-bound by caller
        self.eqns(jaxpr.eqns)

    def eqns(self, eqns):
        for eqn in eqns:
            self.eqn(eqn)

    def eqn(self, eqn):
        prim = eqn.primitive.name
        invals = [self.val(a) for a in eqn.invars]

        # inline nested call-like primitives
        if prim in ("jit", "pjit", "closed_call", "core_call",
                    "custom_vjp_call", "custom_jvp_call",
                    "custom_vjp_call_jaxpr", "remat", "checkpoint"):
            closed = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if closed is None:
                raise NotImplementedError(f"call primitive {prim}: no jaxpr")
            inner = closed.jaxpr
            sub = _Translator.__new__(_Translator)
            sub.b, sub.env = self.b, {}
            for cv, cval in zip(inner.constvars, closed.consts):
                sub.env[cv] = np.asarray(cval)
            n_extra = len(inner.invars) - len(invals)
            if n_extra:  # custom_jvp passes num_consts first
                ncon = eqn.params.get("num_consts", 0)
                assert ncon == 0 or ncon <= len(invals), "unexpected arity"
            for iv, v in zip(inner.invars, invals):
                sub.env[iv] = v
            sub.eqns(inner.eqns)
            self.bind_out(eqn.outvars, [sub.val(o) for o in inner.outvars])
            return

        # constant partial evaluation
        if all(isinstance(v, np.ndarray) for v in invals):
            res = eqn.primitive.bind(*[np.asarray(v) for v in invals],
                                     **eqn.params)
            res = res if eqn.primitive.multiple_results else [res]
            self.bind_out(eqn.outvars, [np.asarray(r) for r in res])
            return

        handler = getattr(self, f"_p_{prim}", None)
        if handler is None:
            raise NotImplementedError(
                f"ONNX export: unsupported primitive '{prim}' "
                f"(shapes {[getattr(v, 'shape', ()) for v in invals]})")
        handler(eqn, invals)

    # ------------------------------------------------------------- primitives
    def _out_sym(self, eqn, name: str, perm: Tuple[int, ...] = _IDENT):
        ov = eqn.outvars[0]
        s = _Sym(ov.aval.shape, ov.aval.dtype)
        s.variants[perm] = name
        self.env[ov] = s
        return s

    def _common_perm(self, invals):
        """A permutation every symbolic input already has cached (prefer a
        non-identity one so conv trunks chain without transposes)."""
        perms = None
        for v in invals:
            if isinstance(v, _Sym):
                vp = set(v.variants)
                perms = vp if perms is None else (perms & vp)
        if not perms:
            return _IDENT
        non_id = [p for p in perms if p is not _IDENT and p != ()]
        return non_id[0] if non_id else _IDENT

    def _elementwise(self, eqn, invals, op: str):
        out_shape = eqn.outvars[0].aval.shape
        rank = len(out_shape)
        perm = self._common_perm(invals)
        if perm is not _IDENT and perm != ():
            # consts must be same-rank (or scalar) to permute consistently
            for v in invals:
                if isinstance(v, np.ndarray) and v.ndim not in (0, rank):
                    perm = _IDENT
                    break
        names = []
        for v in invals:
            if isinstance(v, np.ndarray):
                if perm is not _IDENT and perm != () and v.ndim == rank:
                    names.append(self.b.const(np.transpose(v, perm)))
                else:
                    names.append(self.b.const(v))
            else:
                names.append(self.name_of(v, perm))
        out = self.b.emit(op, names)
        self._out_sym(eqn, out, perm)

    def _p_add(self, eqn, invals):
        self._elementwise(eqn, invals, "Add")

    def _p_sub(self, eqn, invals):
        self._elementwise(eqn, invals, "Sub")

    def _p_mul(self, eqn, invals):
        self._elementwise(eqn, invals, "Mul")

    def _p_div(self, eqn, invals):
        self._elementwise(eqn, invals, "Div")

    def _p_max(self, eqn, invals):
        # max(x, 0) is ReLU — emit the fused op (cv2/ORT fast path)
        for i, other in ((0, 1), (1, 0)):
            v, o = invals[i], invals[other]
            if (isinstance(v, _Sym) and isinstance(o, np.ndarray)
                    and o.size == 1 and float(o.reshape(-1)[0]) == 0.0):
                perm = self._common_perm([v])
                out = self.b.emit("Relu", [self.name_of(v, perm)])
                self._out_sym(eqn, out, perm)
                return
        self._elementwise(eqn, invals, "Max")

    def _p_min(self, eqn, invals):
        self._elementwise(eqn, invals, "Min")

    def _p_pow(self, eqn, invals):
        self._elementwise(eqn, invals, "Pow")

    def _p_logistic(self, eqn, invals):
        self._elementwise(eqn, invals, "Sigmoid")

    def _p_tanh(self, eqn, invals):
        self._elementwise(eqn, invals, "Tanh")

    def _p_exp(self, eqn, invals):
        self._elementwise(eqn, invals, "Exp")

    def _p_neg(self, eqn, invals):
        self._elementwise(eqn, invals, "Neg")

    def _p_abs(self, eqn, invals):
        self._elementwise(eqn, invals, "Abs")

    def _p_sqrt(self, eqn, invals):
        self._elementwise(eqn, invals, "Sqrt")

    def _p_rsqrt(self, eqn, invals):
        perm = self._common_perm(invals)
        x = self.name_of(invals[0], perm)
        s = self.b.emit("Sqrt", [x])
        one = self.b.const(np.ones((), invals[0].dtype
                                   if isinstance(invals[0], _Sym)
                                   else invals[0].dtype))
        out = self.b.emit("Div", [one, s])
        self._out_sym(eqn, out, perm)

    def _p_integer_pow(self, eqn, invals):
        y = eqn.params["y"]
        perm = self._common_perm(invals)
        x = self.name_of(invals[0], perm)
        e = self.b.const(np.asarray(float(y), np.float32))
        out = self.b.emit("Pow", [x, e])
        self._out_sym(eqn, out, perm)

    def _p_stop_gradient(self, eqn, invals):
        self.bind_out(eqn.outvars, [invals[0]])

    def _p_copy(self, eqn, invals):
        self.bind_out(eqn.outvars, [invals[0]])

    def _p_convert_element_type(self, eqn, invals):
        new = np.dtype(eqn.params["new_dtype"])
        v = invals[0]
        if isinstance(v, _Sym) and v.dtype == new:
            self.bind_out(eqn.outvars, [v])
            return
        perm = self._common_perm(invals)
        out = self.b.emit("Cast", [self.name_of(v, perm)],
                          attrs={"to": P.onnx_dtype(new)})
        self._out_sym(eqn, out, perm)

    def _p_transpose(self, eqn, invals):
        # free: register the output's inverse-perm variant as the input name
        permutation = tuple(eqn.params["permutation"])
        v = invals[0]
        ov = eqn.outvars[0]
        s = _Sym(ov.aval.shape, ov.aval.dtype)
        if isinstance(v, _Sym):
            for vp, vname in v.variants.items():
                # out = transpose(in, perm); variant vp of in satisfies
                # tensor = transpose(in_logical, vp) =
                #          transpose(out_logical, inv(perm) then vp)
                base = _inv(permutation)
                comp = tuple(base[i] for i in vp) if vp else tuple(base)
                s.variants[comp if comp != tuple(range(len(comp))) else _IDENT
                           ] = vname
        else:
            s.variants[_IDENT] = self.b.const(np.transpose(v, permutation))
        self.env[ov] = s

    def _p_reshape(self, eqn, invals):
        new_sizes = eqn.params["new_sizes"]
        x = self.name_of(invals[0], _IDENT)
        shp = self.b.const(np.asarray(new_sizes, np.int64))
        out = self.b.emit("Reshape", [x, shp])
        self._out_sym(eqn, out, _IDENT)

    def _p_squeeze(self, eqn, invals):
        x = self.name_of(invals[0], _IDENT)
        shp = self.b.const(
            np.asarray(eqn.outvars[0].aval.shape, np.int64))
        out = self.b.emit("Reshape", [x, shp])
        self._out_sym(eqn, out, _IDENT)

    def _p_broadcast_in_dim(self, eqn, invals):
        shape = tuple(int(d) for d in eqn.params["shape"])
        bdims = tuple(eqn.params["broadcast_dimensions"])
        v = invals[0]
        in_shape = v.shape if isinstance(v, _Sym) else v.shape
        # step 1: reshape to out-rank with 1s in non-broadcast positions
        mid = [1] * len(shape)
        for i, d in enumerate(bdims):
            mid[d] = int(in_shape[i])
        x = self.name_of(v, _IDENT)
        if tuple(in_shape) != tuple(mid):
            shp = self.b.const(np.asarray(mid, np.int64))
            x = self.b.emit("Reshape", [x, shp])
        # step 2: Expand if any dim actually grows
        if tuple(mid) != shape:
            tgt = self.b.const(np.asarray(shape, np.int64))
            x = self.b.emit("Expand", [x, tgt])
        self._out_sym(eqn, x, _IDENT)

    def _p_concatenate(self, eqn, invals):
        axis = int(eqn.params["dimension"])
        rank = len(eqn.outvars[0].aval.shape)
        perm = self._common_perm(invals)
        if perm is not _IDENT and perm != ():
            ax = list(perm).index(axis)
            names = [self.name_of(v, perm) if isinstance(v, _Sym)
                     else self.b.const(np.transpose(v, perm))
                     for v in invals]
        else:
            ax = axis
            names = [self.name_of(v, _IDENT) for v in invals]
        del rank
        out = self.b.emit("Concat", names, attrs={"axis": ax})
        self._out_sym(eqn, out, perm)

    def _p_slice(self, eqn, invals):
        starts = list(eqn.params["start_indices"])
        ends = list(eqn.params["limit_indices"])
        strides = eqn.params["strides"] or [1] * len(starts)
        x = self.name_of(invals[0], _IDENT)
        axes = list(range(len(starts)))
        out = self.b.emit("Slice", [
            x,
            self.b.const(np.asarray(starts, np.int64)),
            self.b.const(np.asarray(ends, np.int64)),
            self.b.const(np.asarray(axes, np.int64)),
            self.b.const(np.asarray(list(strides), np.int64)),
        ])
        self._out_sym(eqn, out, _IDENT)

    def _p_rev(self, eqn, invals):
        dims = list(eqn.params["dimensions"])
        shape = invals[0].shape
        x = self.name_of(invals[0], _IDENT)
        out = self.b.emit("Slice", [
            x,
            self.b.const(np.asarray([int(shape[d]) - 1 for d in dims],
                                    np.int64)),
            self.b.const(np.asarray([np.iinfo(np.int64).min] * len(dims),
                                    np.int64)),
            self.b.const(np.asarray(dims, np.int64)),
            self.b.const(np.asarray([-1] * len(dims), np.int64)),
        ])
        self._out_sym(eqn, out, _IDENT)

    _NCHW = (0, 3, 1, 2)

    def _p_conv_general_dilated(self, eqn, invals):
        x, w = invals
        dn = eqn.params["dimension_numbers"]
        if (tuple(dn.lhs_spec) != (0, 3, 1, 2)
                or tuple(dn.rhs_spec) != (3, 2, 0, 1)
                or tuple(dn.out_spec) != (0, 3, 1, 2)):
            raise NotImplementedError(
                f"conv dimension_numbers {dn} (expected NHWC/HWIO/NHWC)")
        if not isinstance(w, np.ndarray):
            raise NotImplementedError("conv with non-constant weights")
        if tuple(eqn.params["lhs_dilation"]) != (1, 1):
            return self._conv_transpose(eqn, invals)
        pads = eqn.params["padding"]  # ((ph0,ph1),(pw0,pw1))
        attrs = {
            "strides": [int(s) for s in eqn.params["window_strides"]],
            "pads": [int(pads[0][0]), int(pads[1][0]),
                     int(pads[0][1]), int(pads[1][1])],
            "dilations": [int(d) for d in eqn.params["rhs_dilation"]],
            "group": int(eqn.params["feature_group_count"]),
        }
        w_oihw = np.transpose(w, (3, 2, 0, 1))  # HWIO -> OIHW
        xn = self.name_of(x, self._NCHW)
        out = self.b.emit("Conv", [xn, self.b.const(w_oihw, "W")],
                          attrs=attrs, hint="conv")
        self._out_sym(eqn, out, self._NCHW)

    def _conv_transpose(self, eqn, invals):
        """lax conv with lhs_dilation (flax ConvTranspose, no kernel flip)
        -> ONNX ConvTranspose (which convolves the dilated input with the
        rot180 kernel): W_onnx = rot180(W), pads = k_eff - 1 - pads_lax."""
        x, w = invals
        s = tuple(int(v) for v in eqn.params["lhs_dilation"])
        if tuple(eqn.params["window_strides"]) != (1, 1):
            raise NotImplementedError("strided transposed conv")
        if int(eqn.params["feature_group_count"]) != 1:
            raise NotImplementedError("grouped transposed conv")
        rd = tuple(int(v) for v in eqn.params["rhs_dilation"])
        kh, kw = w.shape[0], w.shape[1]
        keff = ((kh - 1) * rd[0] + 1, (kw - 1) * rd[1] + 1)
        pads_lax = eqn.params["padding"]
        p = [keff[0] - 1 - int(pads_lax[0][0]),
             keff[1] - 1 - int(pads_lax[1][0]),
             keff[0] - 1 - int(pads_lax[0][1]),
             keff[1] - 1 - int(pads_lax[1][1])]
        if any(v < 0 for v in p):
            raise NotImplementedError(f"transposed-conv pads {pads_lax}")
        # HWIO -> IOHW, then rot180 spatially
        w_iohw = np.transpose(w, (2, 3, 0, 1))[:, :, ::-1, ::-1]
        attrs = {
            "strides": list(s),
            "pads": p,
            "dilations": list(rd),
            "group": 1,
        }
        xn = self.name_of(x, self._NCHW)
        out = self.b.emit("ConvTranspose",
                          [xn, self.b.const(np.ascontiguousarray(w_iohw),
                                            "Wt")],
                          attrs=attrs, hint="deconv")
        # shape sanity: ONNX out = s*(i-1) + keff - p_begin - p_end
        ih, iw = x.shape[1], x.shape[2]
        oh = s[0] * (ih - 1) + keff[0] - p[0] - p[2]
        ow = s[1] * (iw - 1) + keff[1] - p[1] - p[3]
        want = eqn.outvars[0].aval.shape
        if (oh, ow) != (want[1], want[2]):
            raise NotImplementedError(
                f"transposed-conv shape mismatch {(oh, ow)} vs {want}")
        self._out_sym(eqn, out, self._NCHW)

    def _p_reduce_window_max(self, eqn, invals):
        wd = tuple(eqn.params["window_dimensions"])
        ws = tuple(eqn.params["window_strides"])
        pads = eqn.params["padding"]
        if (len(wd) != 4 or wd[0] != 1 or wd[3] != 1
                or ws[0] != 1 or ws[3] != 1):
            raise NotImplementedError(f"reduce_window_max window {wd}")
        if eqn.params.get("base_dilation", (1,) * 4) != (1,) * len(wd) or \
                eqn.params.get("window_dilation", (1,) * 4) != (1,) * len(wd):
            raise NotImplementedError("dilated pooling")
        attrs = {
            "kernel_shape": [int(wd[1]), int(wd[2])],
            "strides": [int(ws[1]), int(ws[2])],
            "pads": [int(pads[1][0]), int(pads[2][0]),
                     int(pads[1][1]), int(pads[2][1])],
        }
        xn = self.name_of(invals[0], self._NCHW)
        out = self.b.emit("MaxPool", [xn], attrs=attrs, hint="pool")
        self._out_sym(eqn, out, self._NCHW)

    def _p_dot_general(self, eqn, invals):
        ((lc, rc), (lb, rb)) = eqn.params["dimension_numbers"]
        lhs, rhs = invals
        l_rank = len(lhs.shape)
        r_rank = len(rhs.shape)
        # plain matmul: contract last of lhs with second-to-last (or only
        # other) dim of rhs, no batching
        if (tuple(lb) == () and tuple(rb) == () and tuple(lc) == (l_rank - 1,)
                and tuple(rc) == (max(r_rank - 2, 0),)):
            a = self.name_of(lhs, _IDENT)
            b = self.name_of(rhs, _IDENT)
            out = self.b.emit("MatMul", [a, b])
            self._out_sym(eqn, out, _IDENT)
            return
        raise NotImplementedError(
            f"dot_general dimension_numbers {eqn.params['dimension_numbers']}")

    def _p_reduce_max(self, eqn, invals):
        self._reduce(eqn, invals, "ReduceMax")

    def _p_reduce_sum(self, eqn, invals):
        self._reduce(eqn, invals, "ReduceSum")

    def _reduce(self, eqn, invals, op):
        axes = [int(a) for a in eqn.params["axes"]]
        x = self.name_of(invals[0], _IDENT)
        if op == "ReduceSum":
            # opset 13 moved ReduceSum's axes from attribute to a second
            # int64 input (the other Reduce* ops only follow at opset 18) —
            # an axes ATTRIBUTE here is spec-invalid and rejected by
            # onnxruntime/onnx.checker, though lenient loaders accept it
            ax = self.b.const(np.asarray(axes, np.int64), "axes")
            out = self.b.emit(op, [x, ax], attrs={"keepdims": 0})
        else:
            out = self.b.emit(op, [x], attrs={"axes": axes, "keepdims": 0})
        self._out_sym(eqn, out, _IDENT)

    def _p_gather(self, eqn, invals):
        """Constant-index gathers that are really strided slices (jnp lowers
        `x[:, a::s, b::s]` — the Focus stem — to gather with meshgrid
        indices). The slice interpretation is probe-verified against the
        actual gather semantics before emission."""
        operand, idx = invals
        if not isinstance(idx, np.ndarray):
            raise NotImplementedError("gather with non-constant indices")
        dn = eqn.params["dimension_numbers"]
        out_shape = tuple(eqn.outvars[0].aval.shape)
        op_shape = tuple(operand.shape)
        k_dims = idx.shape[-1]
        axes, starts, ends, steps = [], [], [], []
        for k in range(k_dims):
            a = np.asarray(idx[..., k])
            vary = [d for d in range(a.ndim)
                    if a.shape[d] > 1
                    and not np.all(a == np.take(a, [0], axis=d))]
            if len(vary) > 1:
                raise NotImplementedError("non-separable gather indices")
            vec = a
            for d in range(a.ndim - 1, -1, -1):
                if not vary or d != vary[0]:
                    vec = np.take(vec, 0, axis=d)
            vec = np.atleast_1d(np.asarray(vec, np.int64))
            step = int(vec[1] - vec[0]) if len(vec) > 1 else 1
            if step <= 0 or not np.all(np.diff(vec) == step):
                raise NotImplementedError("non-arithmetic gather indices")
            axes.append(int(dn.start_index_map[k]))
            starts.append(int(vec[0]))
            ends.append(int(vec[-1]) + 1)
            steps.append(step)
        # probe: the strided-slice reading must reproduce gather exactly
        probe = np.arange(int(np.prod(op_shape)),
                          dtype=np.float32).reshape(op_shape)
        want = np.asarray(eqn.primitive.bind(probe, idx, **eqn.params))
        slicer = [slice(None)] * len(op_shape)
        for ax, st, en, sp in zip(axes, starts, ends, steps):
            slicer[ax] = slice(st, en, sp)
        got = probe[tuple(slicer)]
        if got.shape != out_shape or not np.array_equal(got, want):
            raise NotImplementedError("gather is not a strided slice")
        x = self.name_of(operand, _IDENT)
        out = self.b.emit("Slice", [
            x,
            self.b.const(np.asarray(starts, np.int64)),
            self.b.const(np.asarray(ends, np.int64)),
            self.b.const(np.asarray(axes, np.int64)),
            self.b.const(np.asarray(steps, np.int64)),
        ])
        self._out_sym(eqn, out, _IDENT)

    def _p_ge(self, eqn, invals):
        self._elementwise(eqn, invals, "GreaterOrEqual")

    def _p_gt(self, eqn, invals):
        self._elementwise(eqn, invals, "Greater")

    def _p_le(self, eqn, invals):
        self._elementwise(eqn, invals, "LessOrEqual")

    def _p_lt(self, eqn, invals):
        self._elementwise(eqn, invals, "Less")

    def _p_select_n(self, eqn, invals):
        if len(invals) != 3:
            raise NotImplementedError("select_n with >2 cases")
        pred, on_false, on_true = invals
        rank = len(eqn.outvars[0].aval.shape)
        perm = self._common_perm(invals)
        if perm is not _IDENT and perm != ():
            for v in invals:
                if isinstance(v, np.ndarray) and v.ndim not in (0, rank):
                    perm = _IDENT
                    break
        names = []
        for v in (pred, on_true, on_false):
            if isinstance(v, np.ndarray):
                if perm is not _IDENT and perm != () and v.ndim == rank:
                    names.append(self.b.const(np.transpose(v, perm)))
                else:
                    names.append(self.b.const(v))
            else:
                names.append(self.name_of(v, perm))
        out = self.b.emit("Where", names)
        self._out_sym(eqn, out, perm)


# --------------------------------------------------------------- optimization

def _fold_conv_affine(nodes: List[dict], inits: Dict[str, np.ndarray],
                      graph_outputs: Sequence[str]):
    """Fold Conv -> (Sub|Mul|Add const) chains into Conv weight/bias
    (inference-mode BN folding, mirroring torch fuse_conv_and_bn —
    reference utils/torch_utils.py:212-230)."""
    changed = True
    out_set = set(graph_outputs)
    while changed:
        changed = False
        use: Dict[str, int] = {}
        for n in nodes:
            for i in n["inputs"]:
                use[i] = use.get(i, 0) + 1
        producers = {n["outputs"][0]: n for n in nodes if n["outputs"]}
        for n in list(nodes):
            if n["op"] not in ("Add", "Sub", "Mul"):
                continue
            a, b = n["inputs"]
            conv_name, const_name, conv_first = None, None, True
            if a in producers and producers[a]["op"] == "Conv" and b in inits:
                conv_name, const_name = a, b
            elif (b in producers and producers[b]["op"] == "Conv"
                  and a in inits):
                conv_name, const_name, conv_first = b, a, False
            else:
                continue
            if use.get(conv_name, 0) != 1 or conv_name in out_set:
                continue
            conv = producers[conv_name]
            w = inits[conv["inputs"][1]]
            oc = w.shape[0]
            c = inits[const_name]
            if c.size not in (1, oc):
                continue
            c = c.reshape(-1).astype(np.float64)
            if c.size == 1:
                c = np.full((oc,), c[0])
            bias = (inits[conv["inputs"][2]].astype(np.float64)
                    if len(conv["inputs"]) > 2 else np.zeros((oc,)))
            w = w.astype(np.float64)
            if n["op"] == "Mul":
                w = w * c.reshape(oc, 1, 1, 1)
                bias = bias * c
            elif n["op"] == "Add":
                bias = bias + c
            elif n["op"] == "Sub" and conv_first:
                bias = bias - c
            else:  # const - conv
                w, bias = -w, c - bias
            new_w = conv["inputs"][1]
            inits[new_w] = np.ascontiguousarray(w.astype(np.float32))
            if len(conv["inputs"]) > 2:
                inits[conv["inputs"][2]] = bias.astype(np.float32)
            else:
                bname = new_w + "_b"
                inits[bname] = bias.astype(np.float32)
                conv["inputs"].append(bname)
            # rewire: conv now produces the affine node's output
            conv["outputs"][0] = n["outputs"][0]
            nodes.remove(n)
            changed = True
            break


def _dce(nodes: List[dict], inits: Dict[str, np.ndarray],
         graph_outputs: Sequence[str]):
    live = set(graph_outputs)
    kept = []
    for n in reversed(nodes):
        if any(o in live for o in n["outputs"]):
            kept.append(n)
            live.update(n["inputs"])
    kept.reverse()
    return kept, {k: v for k, v in inits.items() if k in live}


# ---------------------------------------------------------------- entry point

def export_onnx(fn, example_args, path: str, *,
                input_names: Optional[Sequence[str]] = None,
                output_names: Optional[Sequence[str]] = None,
                opset: int = 13, fold_bn: bool = True) -> str:
    """Trace `fn` (params closed over) on `example_args` and write ONNX.

    fn must be shape-static and built from the supported primitive set
    (conv/pool/elementwise/reshape/concat/slice/matmul — everything the
    detection zoo's inference paths use). Returns `path`.
    """
    closed = jax.make_jaxpr(fn)(*example_args)
    jaxpr = closed.jaxpr

    b = _Builder()
    tr = _Translator(b)
    input_names = list(input_names or
                       [f"input_{i}" for i in range(len(jaxpr.invars))])
    graph_inputs = []
    for name, iv in zip(input_names, jaxpr.invars):
        s = _Sym(iv.aval.shape, iv.aval.dtype)
        s.variants[_IDENT] = name
        tr.env[iv] = s
        graph_inputs.append(P.value_info(name, np.dtype(iv.aval.dtype),
                                         iv.aval.shape))
    for cv, cval in zip(jaxpr.constvars, closed.consts):
        tr.env[cv] = np.asarray(cval)
    tr.eqns(jaxpr.eqns)

    outs = jax.tree.leaves([tr.val(o) for o in jaxpr.outvars])
    output_names = list(output_names or
                        [f"output_{i}" for i in range(len(outs))])
    graph_outputs, out_infos = [], []
    for name, v in zip(output_names, outs):
        if isinstance(v, np.ndarray):  # fully constant output
            cname = b.const(v.astype(np.float32)
                            if v.dtype == np.float64 else v)
            oname = b.emit("Identity", [cname])
        else:
            oname = tr.name_of(v, _IDENT)
        # rename via Identity only if needed to carry the requested name
        b.nodes.append({"op": "Identity", "inputs": [oname],
                        "outputs": [name], "attrs": {}})
        graph_outputs.append(name)
        shape = v.shape
        dt = v.dtype if isinstance(v, np.ndarray) else v.dtype
        out_infos.append(P.value_info(name, np.dtype(dt), shape))

    if fold_bn:
        _fold_conv_affine(b.nodes, b.inits, graph_outputs)
    b.nodes, b.inits = _dce(b.nodes, b.inits, graph_outputs)

    node_bytes = [P.node(n["op"], n["inputs"], n["outputs"],
                         attrs=n["attrs"]) for n in b.nodes]
    init_bytes = [P.tensor(k, v) for k, v in b.inits.items()]
    g = P.graph(node_bytes, "efficientteacher_tpu", init_bytes,
                graph_inputs, out_infos)
    data = P.model(g, opset=opset)
    with open(path, "wb") as f:
        f.write(data)
    return path
