! Fortran interface to the strumpack_tpu C API via iso_c_binding.
!
! Role of the reference's fortran/strumpack.f90:33 (SWIG-generated module
! over the C interface).  Hand-written against capi/strumpack_tpu.h; link
! with -lstrumpack_tpu_c.  NOTE: no Fortran compiler ships in this image,
! so this module is provided as source for users with gfortran; the C API
! itself is covered by tests/test_capi.py.
module strumpack_tpu
  use iso_c_binding
  implicit none

  integer(c_int), parameter :: STRUMPACK_FLOAT = 0
  integer(c_int), parameter :: STRUMPACK_DOUBLE = 1
  integer(c_int), parameter :: STRUMPACK_FLOATCOMPLEX = 2
  integer(c_int), parameter :: STRUMPACK_DOUBLECOMPLEX = 3

  integer(c_int), parameter :: STRUMPACK_SUCCESS = 0
  integer(c_int), parameter :: STRUMPACK_MATRIX_NOT_SET = 1

  type, bind(c) :: STRUMPACK_SparseSolver
    type(c_ptr) :: obj
    integer(c_int) :: precision
  end type

  ! structured dense matrix handle (structured/StructuredMatrix.h role)
  type, bind(c) :: SP_StructMat
    type(c_ptr) :: obj
    integer(c_int) :: precision
  end type

  interface
    function STRUMPACK_init_mt(S, precision, argc, argv, verbose) &
        bind(c, name="STRUMPACK_init_mt") result(rc)
      import :: STRUMPACK_SparseSolver, c_int, c_ptr
      type(STRUMPACK_SparseSolver), intent(inout) :: S
      integer(c_int), value :: precision, argc, verbose
      type(c_ptr), value :: argv
      integer(c_int) :: rc
    end function

    subroutine STRUMPACK_destroy(S) bind(c, name="STRUMPACK_destroy")
      import :: STRUMPACK_SparseSolver
      type(STRUMPACK_SparseSolver), intent(inout) :: S
    end subroutine

    function STRUMPACK_set_csr_matrix(S, n, row_ptr, col_ind, values, &
        symmetric_pattern) bind(c, name="STRUMPACK_set_csr_matrix") result(rc)
      import :: STRUMPACK_SparseSolver, c_int, c_int64_t, c_ptr
      type(STRUMPACK_SparseSolver), value :: S
      integer(c_int64_t), value :: n
      type(c_ptr), value :: row_ptr, col_ind, values
      integer(c_int), value :: symmetric_pattern
      integer(c_int) :: rc
    end function

    function STRUMPACK_reorder(S) bind(c, name="STRUMPACK_reorder") result(rc)
      import :: STRUMPACK_SparseSolver, c_int
      type(STRUMPACK_SparseSolver), value :: S
      integer(c_int) :: rc
    end function

    function STRUMPACK_reorder_regular(S, nx, ny, nz, components, width) &
        bind(c, name="STRUMPACK_reorder_regular") result(rc)
      import :: STRUMPACK_SparseSolver, c_int
      type(STRUMPACK_SparseSolver), value :: S
      integer(c_int), value :: nx, ny, nz, components, width
      integer(c_int) :: rc
    end function

    function STRUMPACK_factor(S) bind(c, name="STRUMPACK_factor") result(rc)
      import :: STRUMPACK_SparseSolver, c_int
      type(STRUMPACK_SparseSolver), value :: S
      integer(c_int) :: rc
    end function

    function STRUMPACK_solve(S, b, x, use_initial_guess) &
        bind(c, name="STRUMPACK_solve") result(rc)
      import :: STRUMPACK_SparseSolver, c_int, c_ptr
      type(STRUMPACK_SparseSolver), value :: S
      type(c_ptr), value :: b, x
      integer(c_int), value :: use_initial_guess
      integer(c_int) :: rc
    end function

    function STRUMPACK_its(S) bind(c, name="STRUMPACK_its") result(its)
      import :: STRUMPACK_SparseSolver, c_int
      type(STRUMPACK_SparseSolver), value :: S
      integer(c_int) :: its
    end function

    subroutine STRUMPACK_set_rel_tol(S, tol) &
        bind(c, name="STRUMPACK_set_rel_tol")
      import :: STRUMPACK_SparseSolver, c_double
      type(STRUMPACK_SparseSolver), value :: S
      real(c_double), value :: tol
    end subroutine

    ! ---- structured dense matrices (structured/fortran role) ----
    function SP_d_struct_from_dense(S, rows, cols, A, ldA, stype, &
        rel_tol, leaf_size, max_rank) &
        bind(c, name="SP_d_struct_from_dense") result(rc)
      import :: SP_StructMat, c_int, c_int64_t, c_double, c_ptr
      type(SP_StructMat) :: S
      integer(c_int64_t), value :: rows, cols, ldA
      type(c_ptr), value :: A
      integer(c_int), value :: stype, leaf_size, max_rank
      real(c_double), value :: rel_tol
      integer(c_int) :: rc
    end function

    function SP_d_struct_mult(S, nrhs, B, C) &
        bind(c, name="SP_d_struct_mult") result(rc)
      import :: SP_StructMat, c_int, c_int64_t, c_ptr
      type(SP_StructMat), value :: S
      integer(c_int64_t), value :: nrhs
      type(c_ptr), value :: B, C
      integer(c_int) :: rc
    end function

    function SP_d_struct_factor(S) &
        bind(c, name="SP_d_struct_factor") result(rc)
      import :: SP_StructMat, c_int
      type(SP_StructMat), value :: S
      integer(c_int) :: rc
    end function

    function SP_d_struct_solve(S, nrhs, B) &
        bind(c, name="SP_d_struct_solve") result(rc)
      import :: SP_StructMat, c_int, c_int64_t, c_ptr
      type(SP_StructMat), value :: S
      integer(c_int64_t), value :: nrhs
      type(c_ptr), value :: B
      integer(c_int) :: rc
    end function

    subroutine SP_d_struct_destroy(S) bind(c, name="SP_d_struct_destroy")
      import :: SP_StructMat
      type(SP_StructMat) :: S
    end subroutine

  end interface
end module strumpack_tpu
