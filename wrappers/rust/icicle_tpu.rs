//! Safe, typed Rust wrapper over the icicle_tpu C ABI — the counterpart of
//! the reference's `wrappers/rust` crates (icicle-core/icicle-runtime,
//! wrappers/rust/Cargo.toml:3-19), as a single dependency-free module so it
//! builds with bare `rustc --crate-type rlib` (no cargo in CI).
//!
//! Errors surface as `Result<_, IcicleError>` carrying the runtime's last
//! error string; buffers are plain `Vec<u32>` / `Vec<u8>` little-endian
//! limb/byte layouts, exactly as `include/icicle_tpu.h` documents.
//!
//! Build + smoke test (see .github/workflows/ci.yml rust-consumer job):
//!   rustc -O --crate-type rlib wrappers/rust/icicle_tpu.rs -o build/libicicle_tpu_rs.rlib
//!   rustc -O wrappers/rust/smoke.rs --extern icicle_tpu=build/libicicle_tpu_rs.rlib \
//!         -L build -l icicle_tpu -o build/rust_wrapper_smoke

use std::ffi::{CStr, CString};
use std::os::raw::{c_char, c_int};

mod ffi {
    use std::os::raw::{c_char, c_int};

    #[link(name = "icicle_tpu")]
    extern "C" {
        pub fn icicle_tpu_init(platform: *const c_char) -> c_int;
        pub fn icicle_tpu_shutdown();
        pub fn icicle_tpu_last_error() -> *const c_char;
        pub fn icicle_tpu_field_limbs(field: *const c_char) -> c_int;
        pub fn icicle_tpu_ntt(
            field: *const c_char,
            data: *const u32,
            n: usize,
            dir: c_int,
            out: *mut u32,
        ) -> c_int;
        pub fn icicle_tpu_vec_op(
            field: *const c_char,
            op: *const c_char,
            a: *const u32,
            b: *const u32,
            n: usize,
            out: *mut u32,
        ) -> c_int;
        pub fn icicle_tpu_merkle_build(
            field: *const c_char,
            leaves: *const u32,
            n_leaves: usize,
            root_out: *mut u32,
        ) -> c_int;
        pub fn icicle_tpu_poly_mul(
            field: *const c_char,
            a: *const u32,
            na: usize,
            b: *const u32,
            nb: usize,
            out: *mut u32,
        ) -> c_int;
        pub fn icicle_tpu_poly_eval(
            field: *const c_char,
            a: *const u32,
            na: usize,
            x: *const u32,
            out: *mut u32,
        ) -> c_int;
        pub fn icicle_tpu_lattice_decompose(
            input: *const u32,
            n: usize,
            base: u32,
            nof_digits: usize,
            out: *mut u32,
        ) -> c_int;
        pub fn icicle_tpu_lattice_recompose(
            digits: *const u32,
            total: usize,
            base: u32,
            out_size: usize,
            out: *mut u32,
        ) -> c_int;
    }
}

#[derive(Debug)]
pub struct IcicleError {
    pub code: i32,
    pub message: String,
}

fn last_error(code: c_int) -> IcicleError {
    let message = unsafe {
        CStr::from_ptr(ffi::icicle_tpu_last_error())
            .to_string_lossy()
            .into_owned()
    };
    IcicleError {
        code: code as i32,
        message,
    }
}

fn check(code: c_int) -> Result<(), IcicleError> {
    if code == 0 {
        Ok(())
    } else {
        Err(last_error(code))
    }
}

/// NTT direction (reference `NTTDir`).
#[derive(Clone, Copy)]
pub enum NttDir {
    Forward,
    Inverse,
}

/// Handle to the embedded runtime. One per process; `Drop` shuts it down.
pub struct IcicleTpu {
    _priv: (),
}

impl IcicleTpu {
    /// `platform`: "cpu" to pin the XLA CPU backend, None for auto.
    pub fn init(platform: Option<&str>) -> Result<Self, IcicleError> {
        let c;
        let ptr = match platform {
            Some(p) => {
                c = CString::new(p).unwrap();
                c.as_ptr()
            }
            None => std::ptr::null(),
        };
        check(unsafe { ffi::icicle_tpu_init(ptr) })?;
        Ok(IcicleTpu { _priv: () })
    }

    pub fn field_limbs(&self, field: &str) -> Result<usize, IcicleError> {
        let f = CString::new(field).unwrap();
        let n = unsafe { ffi::icicle_tpu_field_limbs(f.as_ptr()) };
        if n <= 0 {
            return Err(last_error(2));
        }
        Ok(n as usize)
    }

    /// In-place-size NTT over `n` field elements (limb-flat input).
    pub fn ntt(&self, field: &str, data: &[u32], n: usize, dir: NttDir)
               -> Result<Vec<u32>, IcicleError> {
        let f = CString::new(field).unwrap();
        let mut out = vec![0u32; data.len()];
        let d = match dir {
            NttDir::Forward => 0,
            NttDir::Inverse => 1,
        };
        check(unsafe {
            ffi::icicle_tpu_ntt(f.as_ptr(), data.as_ptr(), n, d,
                                out.as_mut_ptr())
        })?;
        Ok(out)
    }

    /// Elementwise field op: "add", "sub" or "mul".
    pub fn vec_op(&self, field: &str, op: &str, a: &[u32], b: &[u32],
                  n: usize) -> Result<Vec<u32>, IcicleError> {
        let f = CString::new(field).unwrap();
        let o = CString::new(op).unwrap();
        let mut out = vec![0u32; a.len()];
        check(unsafe {
            ffi::icicle_tpu_vec_op(f.as_ptr(), o.as_ptr(), a.as_ptr(),
                                   b.as_ptr(), n, out.as_mut_ptr())
        })?;
        Ok(out)
    }

    /// Poseidon2 arity-2 Merkle root over `n_leaves` field-element leaves.
    pub fn merkle_root(&self, field: &str, leaves: &[u32], n_leaves: usize)
                       -> Result<Vec<u32>, IcicleError> {
        let f = CString::new(field).unwrap();
        let limbs = self.field_limbs(field)?;
        let mut out = vec![0u32; limbs];
        check(unsafe {
            ffi::icicle_tpu_merkle_build(f.as_ptr(), leaves.as_ptr(),
                                         n_leaves, out.as_mut_ptr())
        })?;
        Ok(out)
    }

    /// Coefficient-domain polynomial product: na+nb-1 coefficients.
    pub fn poly_mul(&self, field: &str, a: &[u32], na: usize, b: &[u32],
                    nb: usize) -> Result<Vec<u32>, IcicleError> {
        let f = CString::new(field).unwrap();
        let limbs = self.field_limbs(field)?;
        let mut out = vec![0u32; (na + nb - 1) * limbs];
        check(unsafe {
            ffi::icicle_tpu_poly_mul(f.as_ptr(), a.as_ptr(), na, b.as_ptr(),
                                     nb, out.as_mut_ptr())
        })?;
        Ok(out)
    }

    /// Evaluate the polynomial at one field element.
    pub fn poly_eval(&self, field: &str, a: &[u32], na: usize, x: &[u32])
                     -> Result<Vec<u32>, IcicleError> {
        let f = CString::new(field).unwrap();
        let limbs = self.field_limbs(field)?;
        let mut out = vec![0u32; limbs];
        check(unsafe {
            ffi::icicle_tpu_poly_eval(f.as_ptr(), a.as_ptr(), na, x.as_ptr(),
                                      out.as_mut_ptr())
        })?;
        Ok(out)
    }

    /// Balanced base-`base` decomposition of babykoala Zq elements
    /// ((n, 2)-u32 rows), digit-major output.
    pub fn lattice_decompose(&self, zq: &[u32], n: usize, base: u32,
                             nof_digits: usize)
                             -> Result<Vec<u32>, IcicleError> {
        let mut out = vec![0u32; nof_digits * n * 2];
        check(unsafe {
            ffi::icicle_tpu_lattice_decompose(zq.as_ptr(), n, base,
                                              nof_digits, out.as_mut_ptr())
        })?;
        Ok(out)
    }

    /// Inverse of `lattice_decompose`.
    pub fn lattice_recompose(&self, digits: &[u32], total: usize, base: u32,
                             out_size: usize)
                             -> Result<Vec<u32>, IcicleError> {
        let mut out = vec![0u32; out_size * 2];
        check(unsafe {
            ffi::icicle_tpu_lattice_recompose(digits.as_ptr(), total, base,
                                              out_size, out.as_mut_ptr())
        })?;
        Ok(out)
    }
}

impl Drop for IcicleTpu {
    fn drop(&mut self) {
        unsafe { ffi::icicle_tpu_shutdown() }
    }
}
