package graft.replicate

/** Replicator control-plane FSM. States and the legal-transition map match
  * the reference exactly (`pkg/replicator/fsm.go:16-26`, transitions
  * `:55-89`): an illegal transition is an error, not a no-op.
  */
object FsmState extends Enumeration {
  type FsmState = Value
  val Created, Connecting, Streaming, Paused, Stopped, Reconnecting, Error = Value
}

class IllegalTransitionException(from: FsmState.FsmState, to: FsmState.FsmState)
  extends IllegalStateException(s"illegal FSM transition: $from -> $to")

class Fsm(initial: FsmState.FsmState = FsmState.Created) {
  import FsmState._

  /** Legal transitions, keyed by from-state (`pkg/replicator/fsm.go:55-89`). */
  val legal: Map[FsmState, Set[FsmState]] = Map(
    Created      -> Set(Connecting, Stopped),
    Connecting   -> Set(Streaming, Error, Stopped),
    Streaming    -> Set(Paused, Stopped, Reconnecting, Error),
    Paused       -> Set(Streaming, Stopped, Error),
    Reconnecting -> Set(Streaming, Error, Stopped),
    Error        -> Set(Connecting, Stopped),
    Stopped      -> Set(Connecting))

  @volatile private var current: FsmState = initial

  def state: FsmState = current

  /** Attempt a transition; throws IllegalTransitionException when the move
    * is not in the legal map (reference `Transition`, fsm.go:109-129).
    */
  def transition(to: FsmState): FsmState = synchronized {
    if (!legal.getOrElse(current, Set.empty).contains(to))
      throw new IllegalTransitionException(current, to)
    current = to
    current
  }

  def canTransition(to: FsmState): Boolean =
    legal.getOrElse(current, Set.empty).contains(to)
}
