"""Correctness oracle: the reference C++ library, compiled at test time.

The reference sources are read straight from the read-only mount
``/root/reference`` (never vendored into this repo) and built once into a
shared library cached under the pytest cache.  Only the thin ``extern "C"``
shims below are ours.  If the reference mount or toolchain is unavailable,
oracle-based tests are skipped; invariant-based tests keep running.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess

import numpy as np

REF = pathlib.Path("/root/reference")
_CACHE = pathlib.Path(os.environ.get("ORACLE_CACHE",
                                     "/tmp/cp_pfdr_oracle"))

_WRAPPER = r"""
// The bounds headers redefine the Lipschtype enum already defined by the l1
// header; pre-claim their include guards and declare those entry points
// manually instead.
#include "REFDIR/include/PFDR_graph_quadratic_d1_l1.hpp"
#include "REFDIR/include/PFDR_graph_loss_d1_simplex.hpp"
#include "REFDIR/include/CP_PFDR_graph_quadratic_d1_l1.hpp"
#include "REFDIR/include/CP_PFDR_graph_loss_d1_simplex.hpp"
#include "REFDIR/include/proj_simplex.hpp"
#include "REFDIR/include/operator_norm_matrix.hpp"
#include <cstdlib>
#include <cstring>

template <typename real>
void PFDR_graph_quadratic_d1_bounds(const int V, const int E, const int N,
    real *X, const real *Y, const real *A, const int *Eu, const int *Ev,
    const real *La_d1, const real mn, const real mx,
    const Lipschtype Ltype, const real *L, const real rho,
    const real condMin, real difRcd, const real difTol, const int itMax,
    int *it, real *Obj, real *Dif, const int verbose);

template <typename real> struct CPqb_Restart;

template <typename real>
void CP_PFDR_graph_quadratic_d1_bounds(const int V, const int E, const int N,
    int *rV, int *Cv, real **rX, const real *Y, const real *A,
    const int *Eu, const int *Ev, const real *La_d1,
    const real mn, const real mx,
    const real CP_difTol, const int CP_itMax, int *CP_it,
    const real PFDR_rho, const real PFDR_condMin,
    const real PFDR_difRcd, const real PFDR_difTol, const int PFDR_itMax,
    double *Time, real *Obj, real *Dif, const int verbose,
    struct CPqb_Restart<real> *CP_restart);

extern "C" {

void ref_pfdr_ql1(int V, int E, int N, double*X, const double*Y,
    const double*A, const int*Eu, const int*Ev, const double*La_d1,
    const double*La_l1, int positivity, int Ltype, const double*L,
    double rho, double condMin, double difRcd, double difTol, int itMax,
    int*it, double*Obj, double*Dif, int verbose){
  PFDR_graph_quadratic_d1_l1<double>(V,E,N,X,Y,A,Eu,Ev,La_d1,La_l1,
    positivity,(Lipschtype)Ltype,L,rho,condMin,difRcd,difTol,itMax,it,
    Obj,Dif,verbose);
}

void ref_pfdr_qbounds(int V, int E, int N, double*X, const double*Y,
    const double*A, const int*Eu, const int*Ev, const double*La_d1,
    double mn, double mx, int Ltype, const double*L, double rho,
    double condMin, double difRcd, double difTol, int itMax, int*it,
    double*Obj, double*Dif, int verbose){
  PFDR_graph_quadratic_d1_bounds<double>(V,E,N,X,Y,A,Eu,Ev,La_d1,mn,mx,
    (Lipschtype)Ltype,L,rho,condMin,difRcd,difTol,itMax,it,Obj,Dif,verbose);
}

void ref_pfdr_simplex(int K, int V, int E, double al, const double*La_f,
    double*P, const double*Q, const int*Eu, const int*Ev,
    const double*La_d1, double rho, double condMin, double difRcd,
    double difTol, int itMax, int*it, double*Obj, double*Dif, int verbose){
  PFDR_graph_loss_d1_simplex<double>(K,V,E,al,La_f,P,Q,Eu,Ev,La_d1,rho,
    condMin,difRcd,difTol,itMax,it,Obj,Dif,verbose);
}

int ref_cp_ql1(int V, int E, int N, int*rV, int*Cv, double*rX_out,
    const double*Y, const double*A, const int*Eu, const int*Ev,
    const double*La_d1, const double*La_l1, int positivity,
    double CP_difTol, int CP_itMax, int*CP_it, double rho, double condMin,
    double difRcd, double difTol, int itMax, double*Time, double*Obj,
    double*Dif, int verbose){
  double *rX = NULL;
  CP_PFDR_graph_quadratic_d1_l1<double>(V,E,N,rV,Cv,&rX,Y,A,Eu,Ev,La_d1,
    La_l1,positivity,CP_difTol,CP_itMax,CP_it,rho,condMin,difRcd,difTol,
    itMax,Time,Obj,Dif,verbose,NULL);
  std::memcpy(rX_out, rX, (*rV)*sizeof(double));
  std::free(rX);
  return *rV;
}

int ref_cp_ql1_duplex(int V, int E, int N, int*rV, int*Cv, double*rX_out,
    const double*Y, const double*A, const int*Eu, const int*Ev,
    const double*La_d1, const double*La_l1, int positivity,
    double CP_difTol, int CP_itMax, int*CP_it, double rho, double condMin,
    double difRcd, double difTol, int itMax, double*Time, double*Obj,
    double*Dif, int verbose){
  double *rX = NULL;
  CP_PFDR_graph_quadratic_d1_l1_duplex<double>(V,E,N,rV,Cv,&rX,Y,A,Eu,Ev,
    La_d1,La_l1,positivity,CP_difTol,CP_itMax,CP_it,rho,condMin,difRcd,
    difTol,itMax,Time,Obj,Dif,verbose,NULL);
  std::memcpy(rX_out, rX, (*rV)*sizeof(double));
  std::free(rX);
  return *rV;
}

int ref_cp_qbounds(int V, int E, int N, int*rV, int*Cv, double*rX_out,
    const double*Y, const double*A, const int*Eu, const int*Ev,
    const double*La_d1, double mn, double mx,
    double CP_difTol, int CP_itMax, int*CP_it, double rho, double condMin,
    double difRcd, double difTol, int itMax, double*Time, double*Obj,
    double*Dif, int verbose){
  double *rX = NULL;
  CP_PFDR_graph_quadratic_d1_bounds<double>(V,E,N,rV,Cv,&rX,Y,A,Eu,Ev,
    La_d1,mn,mx,CP_difTol,CP_itMax,CP_it,rho,condMin,difRcd,difTol,itMax,
    Time,Obj,Dif,verbose,NULL);
  std::memcpy(rX_out, rX, (*rV)*sizeof(double));
  std::free(rX);
  return *rV;
}

int ref_cp_simplex(int K, int V, int E, double al, int*rV, int*Cv,
    double*rP_out, const double*Q, const int*Eu, const int*Ev,
    const double*La_d1, double CP_difTol, int CP_itMax, int*CP_it,
    double rho, double condMin, double difRcd, double difTol, int itMax,
    double*Time, double*Obj, double*Dif, int verbose){
  double *rP = NULL;
  CP_PFDR_graph_loss_d1_simplex<double>(K,V,E,al,rV,Cv,&rP,Q,Eu,Ev,La_d1,
    CP_difTol,CP_itMax,CP_it,rho,condMin,difRcd,difTol,itMax,Time,Obj,
    Dif,verbose,NULL);
  std::memcpy(rP_out, rP, (*rV)*(size_t)K*sizeof(double));
  std::free(rP);
  return *rV;
}

void ref_proj_simplex_metric(double*X, const double*M, int D, int N,
    int nm, const double*A, int na){
  proj_simplex_metric<double>(X, M, D, N, nm, A, na);
}

double ref_operator_norm(int M, int N, const double*A, double nTol,
    int itMax, int nbInit, int verbose){
  return operator_norm_matrix<double>(M, N, A, nTol, itMax, nbInit, verbose);
}

} // extern "C"
"""

_SOURCES = [
    "src/PFDR_graph_quadratic_d1_l1.cpp",
    "src/PFDR_graph_quadratic_d1_bounds.cpp",
    "src/PFDR_graph_loss_d1_simplex.cpp",
    "src/CP_PFDR_graph_quadratic_d1_l1.cpp",
    "src/CP_PFDR_graph_quadratic_d1_l1_duplex.cpp",
    "src/CP_PFDR_graph_quadratic_d1_bounds.cpp",
    "src/CP_PFDR_graph_loss_d1_simplex.cpp",
    "src/proj_simplex_metric.cpp",
    "src/operator_norm_matrix.cpp",
    "src/graph.cpp",
    "src/maxflow.cpp",
]

_lib = None
_lib_err = None


def _build() -> pathlib.Path:
    _CACHE.mkdir(parents=True, exist_ok=True)
    wrapper = _WRAPPER.replace("REFDIR", str(REF))
    tag = hashlib.sha256(wrapper.encode()).hexdigest()[:16]
    so = _CACHE / f"libref_{tag}.so"
    if so.exists():
        return so
    cpp = _CACHE / f"wrapper_{tag}.cpp"
    cpp.write_text(wrapper)
    cmd = ["g++", "-O2", "-fopenmp", "-fPIC", "-shared", "-DNDEBUG",
           "-o", str(so), str(cpp)] + [str(REF / s) for s in _SOURCES]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return so


def get_lib():
    """Returns the ctypes-loaded oracle library, or raises."""
    global _lib, _lib_err
    if _lib is not None:
        return _lib
    if _lib_err is not None:
        raise _lib_err
    try:
        lib = ctypes.CDLL(str(_build()))
    except Exception as e:  # pragma: no cover
        _lib_err = e
        raise
    _lib = lib
    return lib


def available() -> bool:
    try:
        get_lib()
        return True
    except Exception:
        return False


_d = np.ctypeslib.ndpointer(np.float64, flags="C")
_i = np.ctypeslib.ndpointer(np.int32, flags="C")


def _f64(x):
    return np.ascontiguousarray(np.asarray(x, np.float64))


def _i32(x):
    return np.ascontiguousarray(np.asarray(x, np.int32))


def pfdr_ql1(Y, A, Eu, Ev, la_d1, la_l1=None, positivity=0, *, N=None,
             Ltype=0, L=None, rho=1.0, condMin=1e-3, difRcd=0.0,
             difTol=1e-7, itMax=10000, x0=None, monitor=False):
    """Runs the reference PFDR quadratic+d1+l1 solver (double precision).

    ``A`` follows the reference N-convention; pass ``N`` explicitly for the
    premultiplied (``N<0``) and diagonal (``N==0``) modes; by default a 2-D
    ``A`` of shape (N, V) is the dense mode.  Matrices are passed
    column-major as the reference expects (numpy: Fortran order).
    """
    lib = get_lib()
    Eu, Ev = _i32(Eu), _i32(Ev)
    V = int(max(Eu.max(initial=-1), Ev.max(initial=-1)) + 1)
    if x0 is not None:
        V = max(V, len(x0))
    E = len(Eu)
    Y = _f64(Y)
    if N is None:
        A_arr = np.asarray(A, np.float64)
        N = A_arr.shape[0] if A_arr.ndim == 2 else 0
    if A is None:
        A_ptr = None
        A_flat = None
    else:
        A_flat = np.asfortranarray(np.asarray(A, np.float64)).ravel(order="F")
        A_ptr = A_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    la_d1 = _f64(np.broadcast_to(la_d1, (E,)))
    if la_l1 is None:
        l1_ptr = None
        la_l1_arr = None
    else:
        la_l1_arr = _f64(np.broadcast_to(la_l1, (V,)))
        l1_ptr = la_l1_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    L_ptr = None
    if L is not None:
        L = _f64(np.atleast_1d(L))
        L_ptr = L.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    X = np.zeros(V) if x0 is None else _f64(x0).copy()
    it = ctypes.c_int(0)
    Obj = np.zeros(itMax + 1)
    Dif = np.zeros(itMax + 1)
    fn = lib.ref_pfdr_ql1
    fn.restype = None
    fn(ctypes.c_int(V), ctypes.c_int(E), ctypes.c_int(int(N)),
       X.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
       Y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
       A_ptr,
       Eu.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
       Ev.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
       la_d1.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
       l1_ptr, ctypes.c_int(positivity), ctypes.c_int(Ltype), L_ptr,
       ctypes.c_double(rho), ctypes.c_double(condMin),
       ctypes.c_double(difRcd), ctypes.c_double(difTol),
       ctypes.c_int(itMax), ctypes.byref(it),
       Obj.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) if monitor else None,
       Dif.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) if monitor else None,
       ctypes.c_int(0))
    return X, it.value, Obj[:it.value + 1], Dif[:it.value]


def pfdr_qbounds(Y, A, Eu, Ev, la_d1, lo=-np.inf, hi=np.inf, *, N=None,
                 Ltype=0, L=None, rho=1.0, condMin=1e-3, difRcd=0.0,
                 difTol=1e-7, itMax=10000, x0=None):
    lib = get_lib()
    Eu, Ev = _i32(Eu), _i32(Ev)
    V = int(max(Eu.max(initial=-1), Ev.max(initial=-1)) + 1)
    if x0 is not None:
        V = max(V, len(x0))
    E = len(Eu)
    Y = _f64(Y)
    if N is None:
        A_arr = np.asarray(A, np.float64)
        N = A_arr.shape[0] if A_arr.ndim == 2 else 0
    if A is None:
        A_ptr = None
    else:
        A_flat = np.asfortranarray(np.asarray(A, np.float64)).ravel(order="F")
        A_ptr = A_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    la_d1 = _f64(np.broadcast_to(la_d1, (E,)))
    L_ptr = None
    if L is not None:
        L = _f64(np.atleast_1d(L))
        L_ptr = L.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    X = np.zeros(V) if x0 is None else _f64(x0).copy()
    it = ctypes.c_int(0)
    fn = lib.ref_pfdr_qbounds
    fn.restype = None
    fn(ctypes.c_int(V), ctypes.c_int(E), ctypes.c_int(int(N)),
       X.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
       Y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
       A_ptr,
       Eu.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
       Ev.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
       la_d1.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
       ctypes.c_double(lo), ctypes.c_double(hi),
       ctypes.c_int(Ltype), L_ptr,
       ctypes.c_double(rho), ctypes.c_double(condMin),
       ctypes.c_double(difRcd), ctypes.c_double(difTol),
       ctypes.c_int(itMax), ctypes.byref(it), None, None, ctypes.c_int(0))
    return X, it.value


def pfdr_simplex(Q, al, Eu, Ev, la_d1, La_f=None, *, rho=1.0, condMin=1e-3,
                 difRcd=0.0, difTol=1e-7, itMax=10000, P0=None):
    """Reference multi-label PFDR; Q is [V, K] row-major = vertex-major."""
    lib = get_lib()
    Eu, Ev = _i32(Eu), _i32(Ev)
    Q = _f64(Q)
    V, K = Q.shape
    E = len(Eu)
    la_d1 = _f64(np.broadcast_to(la_d1, (E,)))
    if P0 is None:
        P0 = np.full((V, K), 1.0 / K)
    P = _f64(P0).copy()
    laf_ptr = None
    if La_f is not None:
        La_f = _f64(np.broadcast_to(La_f, (V,)))
        laf_ptr = La_f.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    it = ctypes.c_int(0)
    fn = lib.ref_pfdr_simplex
    fn.restype = None
    fn(ctypes.c_int(K), ctypes.c_int(V), ctypes.c_int(E), ctypes.c_double(al),
       laf_ptr,
       P.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
       Q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
       Eu.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
       Ev.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
       la_d1.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
       ctypes.c_double(rho), ctypes.c_double(condMin),
       ctypes.c_double(difRcd), ctypes.c_double(difTol),
       ctypes.c_int(itMax), ctypes.byref(it), None, None, ctypes.c_int(0))
    return P, it.value


def _cp_common(Y, A, Eu, Ev, la_d1, N):
    Eu, Ev = _i32(Eu), _i32(Ev)
    V = int(max(Eu.max(initial=-1), Ev.max(initial=-1)) + 1)
    E = len(Eu)
    Y = _f64(Y)
    if N is None:
        A_arr = np.asarray(A, np.float64)
        N = A_arr.shape[0] if A_arr.ndim == 2 else 0
    if A is None:
        A_ptr, A_flat = None, None
    else:
        A_flat = np.asfortranarray(np.asarray(A, np.float64)).ravel(order="F")
        A_ptr = A_flat.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    la_d1 = _f64(np.broadcast_to(la_d1, (E,)))
    return Eu, Ev, V, E, Y, int(N), A_ptr, A_flat, la_d1


def cp_ql1(Y, A, Eu, Ev, la_d1, la_l1=None, positivity=0, *, N=None,
           CP_difTol=1e-3, CP_itMax=10, rho=1.0, condMin=1e-3, difRcd=0.0,
           difTol=1e-6, itMax=10000, duplex=False, monitor=False):
    lib = get_lib()
    Eu, Ev, V, E, Y, N, A_ptr, A_flat, la_d1 = _cp_common(
        Y, A, Eu, Ev, la_d1, N)
    if la_l1 is None:
        l1_ptr = None
    else:
        la_l1 = _f64(np.broadcast_to(la_l1, (V,)))
        l1_ptr = la_l1.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    Cv = np.zeros(V, np.int32)
    rX = np.zeros(V)
    rV = ctypes.c_int(0)
    CP_it = ctypes.c_int(0)
    Time = np.zeros(CP_itMax + 1)
    Obj = np.zeros(CP_itMax + 1)
    Dif = np.zeros(CP_itMax + 1)
    fn = lib.ref_cp_ql1_duplex if duplex else lib.ref_cp_ql1
    fn.restype = ctypes.c_int
    fn(ctypes.c_int(V), ctypes.c_int(E), ctypes.c_int(N),
       ctypes.byref(rV),
       Cv.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
       rX.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
       Y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
       A_ptr,
       Eu.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
       Ev.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
       la_d1.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
       l1_ptr, ctypes.c_int(positivity),
       ctypes.c_double(CP_difTol), ctypes.c_int(CP_itMax),
       ctypes.byref(CP_it),
       ctypes.c_double(rho), ctypes.c_double(condMin),
       ctypes.c_double(difRcd), ctypes.c_double(difTol), ctypes.c_int(itMax),
       Time.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) if monitor else None,
       Obj.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) if monitor else None,
       Dif.ctypes.data_as(ctypes.POINTER(ctypes.c_double)) if monitor else None,
       ctypes.c_int(0))
    n = rV.value
    return Cv, rX[:n], CP_it.value, Obj[:CP_it.value + 1]


def cp_qbounds(Y, A, Eu, Ev, la_d1, lo=-np.inf, hi=np.inf, *, N=None,
               CP_difTol=1e-3, CP_itMax=10, rho=1.0, condMin=1e-3,
               difRcd=0.0, difTol=1e-6, itMax=10000):
    lib = get_lib()
    Eu, Ev, V, E, Y, N, A_ptr, A_flat, la_d1 = _cp_common(
        Y, A, Eu, Ev, la_d1, N)
    Cv = np.zeros(V, np.int32)
    rX = np.zeros(V)
    rV = ctypes.c_int(0)
    CP_it = ctypes.c_int(0)
    fn = lib.ref_cp_qbounds
    fn.restype = ctypes.c_int
    fn(ctypes.c_int(V), ctypes.c_int(E), ctypes.c_int(N),
       ctypes.byref(rV),
       Cv.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
       rX.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
       Y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
       A_ptr,
       Eu.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
       Ev.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
       la_d1.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
       ctypes.c_double(lo), ctypes.c_double(hi),
       ctypes.c_double(CP_difTol), ctypes.c_int(CP_itMax),
       ctypes.byref(CP_it),
       ctypes.c_double(rho), ctypes.c_double(condMin),
       ctypes.c_double(difRcd), ctypes.c_double(difTol), ctypes.c_int(itMax),
       None, None, None, ctypes.c_int(0))
    n = rV.value
    return Cv, rX[:n], CP_it.value


def cp_simplex(Q, al, Eu, Ev, la_d1, *, CP_difTol=1e-3, CP_itMax=10,
               rho=1.0, condMin=1e-3, difRcd=0.0, difTol=1e-6, itMax=10000):
    lib = get_lib()
    Eu, Ev = _i32(Eu), _i32(Ev)
    Q = _f64(Q)
    V, K = Q.shape
    E = len(Eu)
    la_d1 = _f64(np.broadcast_to(la_d1, (E,)))
    Cv = np.zeros(V, np.int32)
    rP = np.zeros((V, K))
    rV = ctypes.c_int(0)
    CP_it = ctypes.c_int(0)
    fn = lib.ref_cp_simplex
    fn.restype = ctypes.c_int
    fn(ctypes.c_int(K), ctypes.c_int(V), ctypes.c_int(E), ctypes.c_double(al),
       ctypes.byref(rV),
       Cv.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
       rP.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
       Q.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
       Eu.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
       Ev.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
       la_d1.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
       ctypes.c_double(CP_difTol), ctypes.c_int(CP_itMax),
       ctypes.byref(CP_it),
       ctypes.c_double(rho), ctypes.c_double(condMin),
       ctypes.c_double(difRcd), ctypes.c_double(difTol), ctypes.c_int(itMax),
       None, None, None, ctypes.c_int(0))
    n = rV.value
    return Cv, rP.ravel()[:n * K].reshape(n, K), CP_it.value


def proj_simplex_metric(X, M, target=1.0):
    """Reference batched simplex projection; X, M are [N, D] row-major
    (one vector per row; the reference is column-major per-vector)."""
    lib = get_lib()
    X = _f64(X).copy()
    M = _f64(np.broadcast_to(M, X.shape))
    N, D = X.shape
    A = np.asarray([float(target)])
    fn = lib.ref_proj_simplex_metric
    fn.restype = None
    fn(X.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
       M.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
       ctypes.c_int(D), ctypes.c_int(N), ctypes.c_int(N),
       A.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), ctypes.c_int(1))
    return X


def operator_norm(A, M=None, N=None, nTol=1e-3, itMax=100, nbInit=10):
    lib = get_lib()
    A = np.asfortranarray(np.asarray(A, np.float64))
    if M is None:
        M, N = A.shape
    fn = lib.ref_operator_norm
    fn.restype = ctypes.c_double
    return fn(ctypes.c_int(M), ctypes.c_int(N),
              A.ravel(order="F").ctypes.data_as(
                  ctypes.POINTER(ctypes.c_double)),
              ctypes.c_double(nTol), ctypes.c_int(itMax),
              ctypes.c_int(nbInit), ctypes.c_int(0))
